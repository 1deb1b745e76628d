"""Generate the golden LM trace fixtures (tests/data/traces/*.npz).

Run from the repo root:

    python tests/make_trace_fixtures.py

Writes one npz per oracle problem containing the full f64 `diff_mode="fd"`
LM trace (outer + per-inner-trial records). These fixtures pin the iterate
SEQUENCE — the half of the parity claim the converged-minimum tests cannot
check (reference trace definition: src/levenberg_marquadt_dyn.cpp:67-114).

Regenerate ONLY when the solver schedule intentionally changes; the
regression test asserts 1e-12 relative agreement.
"""

import os
import sys

# Mirror tests/conftest.py EXACTLY: the 8-virtual-device flag changes XLA's
# per-device host thread partitioning, which changes the summation order of
# large reductions (visible at ~1e-5 rel on the 29k-point cloud trace).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from trace_problems import FIXTURE_DIR, PROBLEMS, result_to_arrays, run_trace


def main():
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    for name in PROBLEMS:
        res = run_trace(name, mode="fd")
        arrays = result_to_arrays(res)
        path = FIXTURE_DIR / f"{name}.npz"
        np.savez_compressed(path, **arrays)
        print(
            f"{name}: status={int(arrays['status'])} "
            f"iters={int(arrays['iterations'])} x={arrays['x']} -> {path}"
        )


if __name__ == "__main__":
    main()
