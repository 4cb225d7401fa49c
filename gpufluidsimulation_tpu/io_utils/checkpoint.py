"""Checkpoint / resume of full simulation state — a capability the reference
lacks entirely (SURVEY.md §5 'Checkpoint/resume: None'); output there is
render-only. Any flax.struct state pytree (Smoke2DState / Smoke3DState /
MappingState) round-trips through one compressed NPZ.

Format v2: arrays are keyed by their pytree PATH (e.g. ``f:.u`` or
``f:.vel_map.bwd[0]``), not flat leaf index, so a checkpoint written under
one solver config fails to load into another with an error that names the
exact missing/extra field — and survives state-layout refactors that only
reorder fields. A ``__gfs_ckpt_version__`` marker distinguishes formats;
v1 (``leaf_{i}``) checkpoints from before the layout change are rejected
with a message saying the format changed rather than a shape mismatch.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_VERSION = 2


def _path_keys(state):
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(state)
    keys = ["f:" + jax.tree_util.keystr(path) for path, _ in leaves_with_paths]
    if len(set(keys)) != len(keys):  # cannot happen for struct pytrees
        raise ValueError("non-unique pytree paths in state")
    return keys, [leaf for _, leaf in leaves_with_paths], treedef


def save_state(path: str, state) -> str:
    keys, leaves, _ = _path_keys(state)
    arrays = {k: np.asarray(x) for k, x in zip(keys, leaves)}
    arrays["__gfs_ckpt_version__"] = np.int64(_VERSION)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_state(path: str, template):
    """Restore into the structure of `template` (same config required)."""
    keys, leaves, treedef = _path_keys(template)
    with np.load(path, allow_pickle=False) as z:
        if "__gfs_ckpt_version__" not in z.files:
            raise ValueError(
                f"checkpoint {path!r} predates the keyed format (v{_VERSION}): "
                "it was written with flat leaf indices against an older state "
                "layout and cannot be safely restored — re-save from a current "
                "run"
            )
        saved = {k for k in z.files if k.startswith("f:")}
        missing = [k for k in keys if k not in saved]
        extra = sorted(saved - set(keys))
        if missing or extra:
            raise ValueError(
                "checkpoint/config mismatch: "
                + (f"missing fields {missing[:8]} " if missing else "")
                + (f"unexpected fields {extra[:8]}" if extra else "")
            )
        new_leaves = []
        for k, ref in zip(keys, leaves):
            arr = z[k]
            if arr.shape != tuple(np.shape(ref)):
                raise ValueError(
                    f"checkpoint field {k} shape {arr.shape} != template "
                    f"{np.shape(ref)} — resolution/config mismatch"
                )
            new_leaves.append(arr.astype(np.asarray(ref).dtype))
    return jax.tree.unflatten(treedef, new_leaves)
