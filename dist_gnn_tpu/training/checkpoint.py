"""Checkpoint / resume.

The reference has none (SURVEY.md §5: training scripts never save the
model).  Here: a dependency-free .npz format that flattens the state
pytree by key path and round-trips TrainState (params, opt_state, step)
exactly, with shape validation against the restoring model/optimizer
template.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from dist_gnn_tpu.training.trainer import TrainState


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, state: TrainState) -> None:
    """Write the training state; ``path`` is a file prefix (no extension)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    np.savez(path + ".npz", **flat)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (same model/optimizer)."""
    with np.load(path + ".npz") as data:
        leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for p, leaf in leaves_paths:
            key = "/".join(str(x) for x in p)
            if key not in data:
                raise KeyError(f"checkpoint missing {key}")
            arr = data[key]
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint shape mismatch at {key}: "
                    f"saved {tuple(arr.shape)} vs template {tuple(np.shape(leaf))}"
                    " — was it written by a different model/optimizer config?"
                )
            new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)
