"""Multi-host initialization + mesh helpers.

The reference has no distributed backend at all (SURVEY.md §2.3); here
multi-host runs use JAX's native runtime: `jax.distributed.initialize` over
DCN, then a global mesh whose data axis spans every chip of every host.
Collectives ride ICI within a slice and DCN across hosts — no hand-written
transport (no NCCL/MPI analogue needed).

Typical pod-slice usage:

    from moptimizer_0_tpu.parallel import multihost
    multihost.initialize()                       # reads TPU env on each host
    mesh = multihost.global_mesh()               # ("data",) over all chips
    res  = distributed_levenberg_marquardt(problem, x0, mesh, cfg)

Each host feeds its local shard of the residual data
(`multihost.host_local_shard`), and every reduction in the engine
(psum of H,b, segment-sums in BA) becomes a cross-host collective
automatically under GSPMD.
"""

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(**kwargs):
    """jax.distributed.initialize passthrough (no-op if single-process)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # single-host / already-initialized runs proceed unchanged
        pass


def global_mesh(axis="data"):
    """1-D mesh over every addressable chip across all hosts."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_shard(array, axis=0):
    """This host's contiguous shard of a global array (split by process)."""
    n = jax.process_count()
    i = jax.process_index()
    size = array.shape[axis]
    chunk = size // n
    start = i * chunk
    stop = size if i == n - 1 else start + chunk
    index = [slice(None)] * array.ndim
    index[axis] = slice(start, stop)
    return array[tuple(index)]
