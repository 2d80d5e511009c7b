"""Checkpoint / resume.

The reference has none (SURVEY.md §5: training scripts never save the
model).  Here: a dependency-free .npz format that flattens the state
pytree by key path and round-trips TrainState (params, opt_state, step)
exactly, with shape AND dtype validation against the restoring
model/optimizer template.

ml_dtypes leaves (bfloat16 etc.) are stored as byte views with a dtype
sidecar: ``np.savez`` silently degrades them to raw void fields
(``|V2``) that cannot be read back otherwise — a checkpoint that saves
fine and is unrecoverable at resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from dist_gnn_tpu.training.trainer import TrainState

# np.savez can round-trip native numpy dtypes; anything else (ml_dtypes:
# bfloat16, float8s, ...) is stored as a uint8 view + "__dtype__/<key>"
# metadata entry
_DTYPE_KEY = "__dtype__/"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        arr = np.asarray(leaf)
        if not _is_native(arr.dtype):
            flat[_DTYPE_KEY + key] = np.array(arr.dtype.name)
            arr = arr.view(np.uint8)  # [..., n] -> [..., n*itemsize]
        flat[key] = arr
    return flat


def _is_native(dt: np.dtype) -> bool:
    """True when np.savez/np.load round-trips the dtype losslessly."""
    return dt.kind in "biufc" and dt.name in np.sctypeDict


def save_checkpoint(path: str, state: TrainState) -> None:
    """Write the training state; ``path`` is a file prefix (no extension)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    np.savez(path + ".npz", **flat)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (same model/optimizer)."""
    import ml_dtypes  # noqa: F401 — registers bfloat16 etc. for np.dtype()

    with np.load(path + ".npz") as data:
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for p, leaf in leaves_paths:
            key = "/".join(str(x) for x in p)
            if key not in data:
                raise KeyError(f"checkpoint missing {key}")
            arr = data[key]
            if _DTYPE_KEY + key in data:
                arr = arr.view(np.dtype(str(data[_DTYPE_KEY + key])))
            tmpl_dtype = np.asarray(leaf).dtype
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint shape mismatch at {key}: "
                    f"saved {tuple(arr.shape)} vs template {tuple(np.shape(leaf))}"
                    " — was it written by a different model/optimizer config?"
                )
            if arr.dtype != tmpl_dtype:
                # silent casting would resume training from degraded (or
                # reinterpreted) weights — as loud as the shape path
                raise ValueError(
                    f"checkpoint dtype mismatch at {key}: saved {arr.dtype} "
                    f"vs template {tmpl_dtype} — was it written by a "
                    "different param_dtype config?"
                )
            new_leaves.append(jax.numpy.asarray(arr))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
