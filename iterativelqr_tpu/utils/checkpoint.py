"""Checkpoint / resume for solver and MPC state (SURVEY.md section 5).

The reference imported JLD2/Scratch but never used them; its only state
carry-over is manual warm starting (reference: src/IterativeLQR.jl:5-6,
src/solver.jl:56-66).  Here solver state is an explicit pytree, so
checkpointing IS warm starting: save the pytree, load it, seed the next
solve.  Uses orbax-checkpoint when available (multi-host safe), otherwise a
plain ``.npz`` of the flattened leaves.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:  # pragma: no cover - environment probe
    import orbax.checkpoint as _ocp
except Exception:  # orbax not installed / incompatible
    _ocp = None


def save(path: str, state: Any) -> str:
    """Save any pytree (Solution, MPCState, (xs, us, duals, ...) tuples).

    Leaves are stored as an index-keyed flat dict, so restore does not depend
    on custom pytree types being registered with the storage backend; ``load``
    rebuilds the structure from a ``like`` template.
    """
    leaves, _ = jax.tree.flatten(state)
    flat = {f"leaf_{i:08d}": np.asarray(l) for i, l in enumerate(leaves)}
    if _ocp is not None:
        ckptr = _ocp.PyTreeCheckpointer()
        path = os.path.abspath(path)
        ckptr.save(path, flat, force=True)
        return path
    out = path if path.endswith(".npz") else path + ".npz"
    np.savez(out, **flat)
    return out


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by ``save``; ``like`` provides the tree structure
    (e.g. a zeros-initialized state of the right shapes)."""
    if os.path.isdir(path):
        # orbax checkpoints are directories; a directory checkpoint cannot be
        # read without orbax — fail loudly instead of np.load-ing a directory
        if _ocp is None:
            raise RuntimeError(
                f"{path!r} is an orbax (directory) checkpoint but orbax-checkpoint "
                "is not importable here; re-save as .npz in the source "
                "environment or install orbax"
            )
        ckptr = _ocp.PyTreeCheckpointer()
        data = ckptr.restore(os.path.abspath(path))
    else:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
    keys = list(data.keys() if hasattr(data, "keys") else data.files)
    # sort numerically by the leaf index: lexicographic sort misorders mixed
    # pad widths (leaf_10000 < leaf_2000)
    leaves = [data[k] for k in sorted(keys, key=lambda s: int(s.rsplit("_", 1)[1]))]
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(
        treedef, [jax.numpy.asarray(l) for l in leaves]
    )
