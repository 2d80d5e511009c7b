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


def initialize_cpu_cluster(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    devices_per_process: int = 4,
) -> None:
    """Bootstrap a REAL multi-process cluster on host CPUs (gloo transport).

    The CPU analog of the reference's multi-node torchrun launch
    (``example/graphsage/node_classification_dist.py:305-306``): N
    OS processes, each owning ``devices_per_process`` local devices,
    rendezvous through the JAX coordinator and form one global mesh.
    Collectives cross process boundaries through gloo over localhost —
    the same SPMD program that runs over ICI/DCN on a pod.

    Must be called before any jnp array creation in the process.
    """
    from dist_gnn_tpu.utils.platform import force_cpu

    force_cpu(devices_per_process)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicate_to_mesh(tree, mesh: Mesh):
    """device_put a pytree of host values replicated over the global mesh.

    Multi-process safe: every process must hold the same host values
    (numpy or single-device arrays); each populates only its addressable
    shards.  Needed because process-local committed arrays cannot feed a
    computation spanning non-addressable devices.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), tree)


def axis_size(mesh: Mesh, axis) -> int:
    """Size of a (possibly tuple) mesh axis."""
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]
