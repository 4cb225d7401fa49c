"""Checkpoint / resume of full simulation state — a capability the reference
lacks entirely (SURVEY.md §5 'Checkpoint/resume: None'); output there is
render-only. Any flax.struct state pytree (Smoke2DState / Smoke3DState /
MappingState) round-trips through one compressed NPZ.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_state(path: str, state) -> str:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_state(path: str, template):
    """Restore into the structure of `template` (same config required)."""
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path, allow_pickle=False) as z:
        new_leaves = []
        for i, ref in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if arr.shape != tuple(np.shape(ref)):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != template "
                    f"{np.shape(ref)} — config mismatch"
                )
            new_leaves.append(arr.astype(np.asarray(ref).dtype))
    return jax.tree.unflatten(treedef, new_leaves)
