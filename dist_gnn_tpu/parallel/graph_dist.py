"""Node-range-sharded graph structure + owner-side distributed sampling.

The reference's structure cache stores each GPU's slice of hot rows as a
compacted sub-CSR served through peer pointers, and the sampling kernel
dereferences peer HBM per neighbor (``src/sampling/cuda/
rowwise_sampling_p2p.cu:41-92``).  On TPU the sampling moves *to the
owner*: seeds are bucketed by owner shard and shipped over ICI; the owner
runs the (uniform/biased) row-wise sampler against its local sub-CSR and
ships back only the k sampled neighbor ids per seed — k·4 bytes instead of
the whole adjacency row.  This is strictly less traffic than a row
exchange, and the owner-side sampler is the same Feistel kernel as the
single-chip path.

Static shapes: every shard's sub-CSR is padded to the max shard nnz; the
request table uses the fixed budget of parallel/feature_store.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dist_gnn_tpu.graph import Graph, HostGraph, INVALID_ID
from dist_gnn_tpu.ops import prng
from dist_gnn_tpu.ops.sampling import SampledNeighbors, sample_biased, sample_uniform
from dist_gnn_tpu.parallel.feature_store import (
    make_request,
    request_budget,
    return_response,
    shard_rows,
)


@dataclasses.dataclass
class ShardedGraph:
    """Per-shard local CSC stacked as mesh-sharded arrays.

    chip d owns global rows [d*shard_size, (d+1)*shard_size); its local CSC
    row i is global row base+i.  ``indices`` hold *global* neighbor ids.
    """

    indptr: jnp.ndarray  # [n, shard_size+1], sharded over axis 0
    indices: jnp.ndarray  # [n, max_shard_nnz], sharded over axis 0
    probs: Optional[jnp.ndarray]  # [n, max_shard_nnz] or None
    mesh: object
    axis_name: str
    shard_size: int
    num_nodes: int
    max_degree: int

    @staticmethod
    def build(
        hg: HostGraph, mesh, axis_name: str = "data"
    ) -> "ShardedGraph":
        n = mesh.shape[axis_name]
        shard = shard_rows(hg.num_nodes, n)
        indptr64 = np.asarray(hg.indptr, dtype=np.int64)
        sub_ptrs, sub_idx, sub_probs = [], [], []
        from dist_gnn_tpu.utils import native

        for d in range(n):
            lo = d * shard
            hi = min(hg.num_nodes, lo + shard)
            rows = np.arange(lo, hi, dtype=np.int32)
            sp, si, spr = native.extract_subcsc(
                rows, indptr64, hg.indices, hg.probs
            )
            if hi - lo < shard:  # pad row range of the last shard
                sp = np.concatenate(
                    [sp, np.full(shard - (hi - lo), sp[-1], dtype=sp.dtype)]
                )
            sub_ptrs.append(sp)
            sub_idx.append(si)
            sub_probs.append(spr)
        max_nnz = max(1, max(len(s) for s in sub_idx))
        idx_mat = np.full((n, max_nnz), 0, dtype=np.int32)
        probs_mat = (
            np.zeros((n, max_nnz), dtype=np.float32) if hg.probs is not None else None
        )
        ptr_dtype = np.int32 if max_nnz < 2**31 else np.int64
        ptr_mat = np.zeros((n, shard + 1), dtype=ptr_dtype)
        for d in range(n):
            ptr_mat[d] = sub_ptrs[d].astype(ptr_dtype)
            idx_mat[d, : len(sub_idx[d])] = sub_idx[d]
            if probs_mat is not None:
                probs_mat[d, : len(sub_probs[d])] = sub_probs[d]
        sh = NamedSharding(mesh, P(axis_name, None))
        return ShardedGraph(
            indptr=jax.device_put(ptr_mat, sh),
            indices=jax.device_put(idx_mat, sh),
            probs=jax.device_put(probs_mat, sh) if probs_mat is not None else None,
            mesh=mesh,
            axis_name=axis_name,
            shard_size=shard,
            num_nodes=hg.num_nodes,
            max_degree=hg.max_degree,
        )

    def local_graph(self, indptr_blk, indices_blk, probs_blk) -> Graph:
        """Per-chip Graph view over the local sub-CSR (call in shard_map
        with the [1, ...] blocks)."""
        return Graph(
            indptr=indptr_blk.reshape(-1),
            indices=indices_blk.reshape(-1),
            probs=probs_blk.reshape(-1) if probs_blk is not None else None,
            num_nodes=self.shard_size,
            num_edges=int(self.indices.shape[1]),
            max_degree=self.max_degree,
        )


def sample_neighbors_sharded(
    sgraph: ShardedGraph,
    indptr_blk: jnp.ndarray,
    indices_blk: jnp.ndarray,
    probs_blk: Optional[jnp.ndarray],
    seeds: jnp.ndarray,  # [L] global ids this chip wants sampled
    seed_mask: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    budget: Optional[int] = None,
) -> Tuple[SampledNeighbors, jnp.ndarray]:
    """Owner-side distributed sampling (call inside shard_map).

    Ships seed ids to their owner shard, samples k neighbors there with the
    local Feistel/Gumbel kernels, ships the [*, k] id blocks back.  Returns
    (SampledNeighbors for the local seeds, overflow count).
    """
    ax = sgraph.axis_name
    n = jax.lax.axis_size(ax)
    me = jax.lax.axis_index(ax)
    L = seeds.shape[0]
    Pb = budget if budget is not None else request_budget(L, n)

    plan, recv, overflow = make_request(seeds, seed_mask, ax, sgraph.shard_size, Pb)
    # serve: sample for the requested global rows on the local sub-CSR
    base = me * sgraph.shard_size
    req_flat = recv.reshape(-1)  # [n*Pb] global ids
    local_rows = jnp.where(
        req_flat == INVALID_ID, INVALID_ID, req_flat - base
    ).astype(jnp.int32)
    lg = sgraph.local_graph(indptr_blk, indices_blk, probs_blk)
    # decorrelate per-owner streams
    owner_key = jax.random.fold_in(key, me)
    if lg.probs is not None:
        nb = sample_biased(lg, local_rows, k, replace, owner_key)
    else:
        nb = sample_uniform(lg, local_rows, k, replace, owner_key)
    served_ids = jnp.where(nb.mask, nb.ids, INVALID_ID).reshape(n, Pb, k)
    ids_back = return_response(plan, served_ids, ax, fill=INVALID_ID)  # [L, k]
    mask_back = ids_back != INVALID_ID
    return SampledNeighbors(ids=ids_back, mask=mask_back), overflow
