"""Checkpoint / resume for solver state.

The reference has none (minimize mutates x0 in place and keeps no history —
SURVEY.md §5). Here every solver state/result is a pytree, so checkpointing
is a flatten → npz round trip; `load` restores into a matching template
(shapes/dtypes validated). No heavyweight dependency: plain numpy archives,
safe for cron/preemption resume of long BA/PGO runs.
"""

import numpy as np

import jax


def _keys(tree):
    paths_vals, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(p) for p, _ in paths_vals], [v for _, v in paths_vals]


def save(path, tree):
    """Write a pytree of arrays to an .npz archive."""
    keys, vals = _keys(tree)
    arrays = {f"arr_{i}": np.asarray(v) for i, v in enumerate(vals)}
    np.savez(path, __keys__=np.array(keys, dtype=object), **arrays)


def load(path, template):
    """Read an archive into the structure of `template` (same treedef)."""
    with np.load(path, allow_pickle=True) as data:
        keys = list(data["__keys__"])
        arrays = [data[f"arr_{i}"] for i in range(len(keys))]
    t_keys, t_vals = _keys(template)
    if t_keys != keys:
        raise ValueError(
            f"checkpoint structure mismatch: saved {keys[:5]}..., template {t_keys[:5]}..."
        )
    for a, t in zip(arrays, t_vals):
        if tuple(a.shape) != tuple(np.shape(t)):
            raise ValueError(f"shape mismatch: saved {a.shape} vs template {np.shape(t)}")
    treedef = jax.tree_util.tree_structure(template)
    leaves = [
        jax.numpy.asarray(a, dtype=getattr(t, "dtype", None))
        for a, t in zip(arrays, t_vals)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
