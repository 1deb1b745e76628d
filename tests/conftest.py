"""Test configuration: CPU backend with 8 virtual devices + x64 parity mode.

The reference's parity oracles are float64 CPU results
(/root/reference/tst/*.cpp); we run the suite on the CPU backend with 8
faked devices so multi-chip sharding tests (shard-invariance, the analogue
of reference tst/multiple_objectives.cpp) run without TPU hardware.
"""

import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) force-registers itself via
# jax.config.update("jax_platforms", "axon,cpu"); override it back to CPU
# before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-dominated (every jitted
# LM variant recompiles per process otherwise).
jax.config.update("jax_compilation_cache_dir", "/tmp/moptimizer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
