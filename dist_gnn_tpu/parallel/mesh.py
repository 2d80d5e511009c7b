"""Device mesh construction + distributed bootstrap.

Replaces the reference's three-plane comm stack (torch.distributed NCCL
process group + private dgs NCCL communicator + CUDA IPC peer maps,
``src/nccl/nccl_context.cc``, ``python/DistGNN/dist/communicator.py:5-17``)
with the JAX SPMD model: one process per host calls
``jax.distributed.initialize``, and a single global :class:`jax.sharding.Mesh`
names the parallel axes.  There is no handle exchange — collectives are
compiler-scheduled over ICI/DCN.

Axes convention:
  * ``data``  — data parallelism over seeds AND node-range sharding of the
                feature/structure stores (the reference's "cache
                parallelism" axis).
  * multi-host meshes use ``('host', 'data')`` with the store sharded over
    both and DP over the product.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    hosts: Optional[int] = None,
) -> Mesh:
    """Build the global mesh.  ``hosts`` forces the first-axis size of a
    2-tier ('host', 'data') mesh (defaults to jax.process_count(); pass
    explicitly to emulate multi-host grouping on a single process, e.g. a
    (2, 4) CPU mesh)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        h = hosts if hosts is not None else max(1, jax.process_count())
        assert n % h == 0, f"{n} devices not divisible into {h} hosts"
        shape = (h, n // h)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (one call per host process).

    The analog of ``create_communicator`` (``communicator.py:5-17``) minus
    the unique-id broadcast — JAX's coordinator handles rendezvous.
    """
    jax.distributed.initialize(**kwargs)


def axis_size(mesh: Mesh, axis) -> int:
    """Size of a (possibly tuple) mesh axis."""
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]
