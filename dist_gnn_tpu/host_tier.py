"""Host-resident base tier: graphs/features BIGGER than device HBM.

This is the TPU answer to the reference's core premise — the full graph
lives in *pinned host memory* and GPU kernels read cache misses over UVA at
PCIe bandwidth (``src/common/pin_memory.cc:7-12``,
``src/feature/cuda/feature_ops.cu:140-210``).  A TPU kernel cannot
dereference host memory, so the per-element UVA load becomes *batched
asynchronous staging*:

  * the **hot tier** (heat/value policy) is resident in HBM and served by
    an in-jit gather;
  * the **base tier** stays in host RAM (numpy / np.memmap — nothing is
    ever uploaded wholesale);
  * each step's miss set is gathered host-side and shipped with an async
    ``jax.device_put`` *while the previous step's compute runs on device*
    (double-buffered by ``training/pipeline.HostTierTrainer``), hiding the
    PCIe transfer the way UVA's overlapped loads did.

Static shapes throughout: the miss set is padded to a fixed ``miss_budget``
with an overflow counter (never silently wrong).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import INVALID_ID
from dist_gnn_tpu.ops.hashtable import np_in_sorted


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HotTier:
    """Device-resident hot rows + routing table.  Passed as a jit ARGUMENT
    (never closed over — baked-in array constants blow compile time)."""

    sorted_ids: jnp.ndarray  # [C] int32 strictly increasing
    rows: jnp.ndarray  # [C, F]


class StagedRows(NamedTuple):
    """One batch's staged miss rows (device arrays + host bookkeeping)."""

    rows: jnp.ndarray  # [R, F] feature rows (zero-padded)
    slots: jnp.ndarray  # [R] int32 positions in the frontier; pad = L (dropped)
    count: int  # host-side: staged miss rows
    overflow: int  # host-side: misses beyond the budget (dropped + counted)


class HostFeatureStore:
    """Features host-resident; hot rows in HBM; misses staged per batch.

    Replaces round-1's ``CachedFeatureStore`` whose miss tier was a
    synchronous numpy gather *inside* ``get_features`` (un-jittable,
    un-overlapped).  Here the host work is split out into :meth:`stage`
    (called by the pipeline driver between batches) and the jit side
    (:func:`assemble_features`) is a pure device function taking
    ``store.hot_tier`` as an argument.

    Parameters
    ----------
    host_features : the FULL feature matrix, host memory (numpy or memmap).
    cache_nids : hot node ids from the heat/value policy (cache/policy.py),
        mirroring the reference ctor (``feature_server.cc:10-61``).
    miss_budget : static per-batch miss capacity R.  Sized from the
        observed miss rate (e.g. frontier_capacity * (1 - hit_rate) * 1.5);
        overflowed misses are dropped-and-counted, visible in metrics.
    """

    def __init__(
        self,
        host_features: np.ndarray,
        cache_nids: np.ndarray,
        miss_budget: int,
        hot_dtype=None,
    ):
        self.base = host_features  # never uploaded wholesale
        cache_sorted = np.unique(np.asarray(cache_nids, dtype=np.int32))
        cache_sorted = cache_sorted[cache_sorted != INVALID_ID]
        self.sorted_np = cache_sorted  # host mirror for stage()
        hot = host_features[cache_sorted] if len(cache_sorted) else (
            np.zeros((0, host_features.shape[1]), host_features.dtype)
        )
        if hot_dtype is not None:
            # raw value cast — a float compression tier (bf16/f16).
            # Integer dtypes would silently corrupt features; the packed
            # int8 tier (per-row scales) lives in ops/quantize +
            # ShardedFeatureStore(quantize=True).
            assert np.dtype(hot_dtype).kind not in ("i", "u"), (
                "hot_dtype is a raw cast; use the packed quantized store "
                "for int8 (ops/quantize.py)"
            )
            hot = np.asarray(hot).astype(hot_dtype)
        self.hot_tier = HotTier(
            sorted_ids=jnp.asarray(cache_sorted), rows=jnp.asarray(hot)
        )
        self.miss_budget = int(miss_budget)

    @property
    def feature_dim(self) -> int:
        return int(self.base.shape[1])

    def hit_rate(self, nids: np.ndarray) -> float:
        if len(self.sorted_np) == 0:
            return 0.0
        member, _ = np_in_sorted(self.sorted_np, nids)
        return float(np.mean(member))

    def stage(self, frontier_np: np.ndarray, fmask_np: np.ndarray) -> StagedRows:
        """Host side: find this frontier's hot-tier misses, gather their
        rows from the host base, start the (async) upload.

        Call while the device is busy with the previous step's compute —
        ``jax.device_put`` returns immediately and the H2D copy overlaps.
        """
        L = len(frontier_np)
        R = self.miss_budget
        member, _ = np_in_sorted(self.sorted_np, frontier_np)
        hit = fmask_np & member
        miss_idx = np.flatnonzero(fmask_np & ~hit)
        # lossless (round-4): the slab GROWS in pow2 buckets past the
        # configured budget instead of dropping — the host always serves;
        # ``overflow`` reports the beyond-budget rows (staged, not lost)
        overflow = max(0, len(miss_idx) - R)
        R = max(R, 1)  # miss_budget=0 must still grow when misses exist
        while R < len(miss_idx):
            R *= 2
        R = min(R, L) if L else R
        m = len(miss_idx)
        rows = np.zeros((R, self.base.shape[1]), dtype=self.base.dtype)
        if m:
            from dist_gnn_tpu.utils import native

            native.gather_rows(self.base, frontier_np[miss_idx], out=rows[:m])
        slots = np.full(R, L, np.int32)  # pad slot L → dropped by the scatter
        slots[:m] = miss_idx
        return StagedRows(
            rows=jax.device_put(rows),
            slots=jax.device_put(slots),
            count=m,
            overflow=overflow,
        )


def assemble_features(
    hot: HotTier,  # pass store.hot_tier as a jit argument
    frontier: jnp.ndarray,  # [L]
    fmask: jnp.ndarray,  # [L]
    staged_rows: jnp.ndarray,  # [R, F]
    staged_slots: jnp.ndarray,  # [R]
) -> jnp.ndarray:
    """Device side (inside jit): hot-tier gather + staged-miss scatter."""
    C = hot.sorted_ids.shape[0]
    if C == 0:
        out = jnp.zeros(
            (frontier.shape[0], staged_rows.shape[1]), staged_rows.dtype
        )
        return out.at[staged_slots].set(staged_rows, mode="drop")
    pos = jnp.clip(jnp.searchsorted(hot.sorted_ids, frontier), 0, C - 1)
    hit = fmask & (hot.sorted_ids[pos] == frontier)
    out = jnp.where(hit[:, None], hot.rows[pos], 0)
    return out.at[staged_slots].set(staged_rows.astype(out.dtype), mode="drop")


class StagedAdjacency(NamedTuple):
    """One hop's staged miss-row adjacency (device arrays)."""

    window: jnp.ndarray  # [M, Dcap] int32 neighbor ids of staged rows
    deg: jnp.ndarray  # [M] int32 true degree (may exceed Dcap for presampled)
    row_of: jnp.ndarray  # [M] int32 position of the staged row in the seeds
    pre_ids: jnp.ndarray  # [M, k] int32 host-presampled ids for huge rows
    pre_mask: jnp.ndarray  # [M, k] bool
    is_pre: jnp.ndarray  # [M] bool — True → use pre_ids, ignore window
    count: int  # host-side: staged rows
    overflow: int  # host-side: misses beyond the budget
    # per-edge weights of the staged window rows (biased graphs only) —
    # the analog of the reference serving probs from pinned host memory
    # inside the biased kernel (rowwise_sampling_bias_p2p.cu:75-98)
    window_probs: Optional[jnp.ndarray] = None  # [M, Dcap] float32


def plan_hop_arrays(
    indptr64: np.ndarray,  # [N+1] host CSC offsets
    indices: np.ndarray,  # [nnz] host CSC neighbor ids
    sorted_hot: np.ndarray,  # [C] sorted hot node ids (this chip's HBM tier)
    miss_budget: int,
    deg_cap: int,
    seeds_np: np.ndarray,  # [L]
    mask_np: np.ndarray,  # [L]
    k: int,
    rng,
    probs: Optional[np.ndarray] = None,  # [nnz] per-edge weights (biased)
) -> tuple:
    """Pure-numpy hop planning shared by the single-chip and distributed
    host-structure stores: probe the hot tier, stage miss adjacency.

    With ``probs`` the staged windows carry the per-edge weights too (the
    device runs exact Gumbel-key A-Res over the full in-window row), and
    hub rows are host-presampled with explicit Gumbel keys — weighted
    sampling works at bigger-than-HBM structure scale, matching the
    reference's pinned-host probs fetch
    (``rowwise_sampling_bias_p2p.cu:75-98``).

    Returns (local_rows [L] int32, dict of StagedAdjacency device-array
    fields as numpy, staged count, overflow count)."""
    L = len(seeds_np)
    safe_seed = np.where(mask_np, seeds_np, 0)
    member, pos = np_in_sorted(sorted_hot, safe_seed)
    hit = mask_np & member
    local_rows = np.where(hit, pos, INVALID_ID).astype(np.int32)

    miss_idx = np.flatnonzero(mask_np & ~hit)
    M = miss_budget
    overflow = max(0, len(miss_idx) - M)
    miss_idx = miss_idx[:M]
    m = len(miss_idx)
    Dcap = deg_cap

    window = np.zeros((M, Dcap), np.int32)
    window_probs = np.zeros((M, Dcap), np.float32) if probs is not None else None
    deg_out = np.zeros(M, np.int32)
    row_of = np.full(M, L, np.int32)  # pad → out-of-bounds scatter drop
    pre_ids = np.full((M, k), INVALID_ID, np.int32)
    pre_mask = np.zeros((M, k), bool)
    is_pre = np.zeros(M, bool)
    if m:
        ids = seeds_np[miss_idx]
        start = indptr64[ids]
        deg = (indptr64[ids + 1] - start).astype(np.int64)
        row_of[:m] = miss_idx
        deg_out[:m] = np.minimum(deg, np.iinfo(np.int32).max)
        small = deg <= Dcap
        # small rows: one vectorised window gather (clipped fancy index)
        pos_mat = start[:, None] + np.arange(Dcap)[None, :]
        pos_mat = np.clip(pos_mat, 0, max(len(indices) - 1, 0))
        in_row = np.arange(Dcap)[None, :] < deg[:, None]
        win = indices[pos_mat]
        win[~in_row] = 0
        win[~small] = 0
        window[:m] = win
        if probs is not None:
            winp = probs[pos_mat].astype(np.float32)
            winp[~in_row] = 0.0
            winp[~small] = 0.0
            window_probs[:m] = winp
        # huge rows: host-side exact k-of-deg draw (few of them); biased
        # rows use explicit Gumbel keys log(u)/w — exact A-Res
        for j in np.flatnonzero(~small):
            d = int(deg[j])
            if probs is not None:
                w = np.asarray(probs[start[j] : start[j] + d], np.float64)
                keys = np.where(
                    w > 0, np.log(rng.random(d)) / np.maximum(w, 1e-38), -np.inf
                )
                picks = np.argsort(-keys)[: min(k, d)]
                picks = picks[keys[picks] > -np.inf]
            else:
                picks = rng.choice(d, size=min(k, d), replace=False)
            row = indices[start[j] : start[j] + d][picks]
            pre_ids[j, : len(row)] = row
            pre_mask[j, : len(row)] = True
            is_pre[j] = True
    arrs = dict(
        window=window, deg=deg_out, row_of=row_of,
        pre_ids=pre_ids, pre_mask=pre_mask, is_pre=is_pre,
    )
    if window_probs is not None:
        arrs["window_probs"] = window_probs
    return local_rows, arrs, m, overflow


class HostCSCStore:
    """Graph STRUCTURE host-resident; hot sub-CSR in HBM; per-hop staging.

    The structure half of the host base tier: sampling a hop first probes
    the hot table (host-side, against the sorted mirror — seeds are on the
    host between hops anyway); hot rows sample from the HBM sub-CSR, miss
    rows have their adjacency staged:

      * deg <= ``deg_cap``: the raw neighbor row ships in a dense
        ``[M, deg_cap]`` window and the DEVICE does the k-of-deg draw
        (Feistel permutation — same sampler as everywhere else);
      * deg > ``deg_cap`` (rare hubs, usually hot-cached anyway): the HOST
        draws k uniform-without-replacement picks and ships just ``[k]``
        ids.  Sampling moves to where the data lives — the same principle
        as the owner-side distributed sampler.

    Mirrors ``P2PCacheSampler``'s per-row local/peer/host routing
    (``src/sampling/cuda/rowwise_sampling_p2p.cu:180-223``) with the host
    tier made explicit instead of UVA-implicit.
    """

    def __init__(
        self,
        hg,  # HostGraph — stays host-resident
        cache_nids: np.ndarray,
        miss_budget: int,
        deg_cap: int = 128,
    ):
        from dist_gnn_tpu.utils import native

        self.hg = hg
        self.indptr64 = np.asarray(hg.indptr, dtype=np.int64)
        self.miss_budget = int(miss_budget)
        self.deg_cap = int(deg_cap)
        cache_sorted = np.unique(np.asarray(cache_nids, dtype=np.int32))
        cache_sorted = cache_sorted[cache_sorted != INVALID_ID]
        self.sorted_np = cache_sorted
        C = len(cache_sorted)
        sp, si, spr = native.extract_subcsc(
            cache_sorted, self.indptr64, hg.indices, hg.probs
        )
        self.hot_max_degree = int(np.diff(sp).max()) if C else 1
        from dist_gnn_tpu.graph import Graph

        # biased graphs: hot sub-CSR carries probs + Walker alias tables so
        # the in-jit hot tier uses the O(1)-draw weighted sampler
        ap = ai = None
        if hg.probs is not None and len(si):
            ap, ai = native.build_alias(sp.astype(np.int64), spr)
        self.hot_graph = Graph(
            indptr=jnp.asarray(sp),
            indices=jnp.asarray(si if len(si) else np.zeros(1, np.int32)),
            probs=(
                jnp.asarray(spr if len(spr) else np.zeros(1, np.float32))
                if hg.probs is not None
                else None
            ),
            num_nodes=max(C, 1),
            num_edges=max(int(len(si)), 1),
            max_degree=self.hot_max_degree,
            alias_prob=jnp.asarray(ap) if ap is not None else None,
            alias_idx=jnp.asarray(ai) if ai is not None else None,
        )

    def hit_rate(self, nids: np.ndarray) -> float:
        if len(self.sorted_np) == 0:
            return 0.0
        member, _ = np_in_sorted(self.sorted_np, nids)
        return float(np.mean(member))

    def plan_hop(self, seeds_np: np.ndarray, mask_np: np.ndarray, k: int, rng):
        """Host side: probe hot tier, stage miss adjacency.

        Returns (local_rows_np [L] — hot slot per seed or INVALID,
        StagedAdjacency).  ``rng`` is a np.random.Generator for the rare
        host-presampled hub rows.
        """
        local_rows, arrs, m, overflow = plan_hop_arrays(
            self.indptr64, self.hg.indices, self.sorted_np,
            self.miss_budget, self.deg_cap, seeds_np, mask_np, k, rng,
            probs=self.hg.probs,
        )
        return local_rows, StagedAdjacency(
            **{name: jax.device_put(a) for name, a in arrs.items()},
            count=m,
            overflow=overflow,
        )


def sample_staged_hop(
    hot_graph,  # Graph pytree — pass store.hot_graph as a jit ARGUMENT
    local_rows: jnp.ndarray,  # [L] hot slots (INVALID on miss)
    staged: StagedAdjacency,
    k: int,
    key: jax.Array,
):
    """Inside jit: hot-tier sampling (Feistel uniform, or the alias/Gumbel
    weighted dispatch when the hot sub-CSR carries probs) + staged-window
    sampling (Feistel k-of-deg, or exact Gumbel-key A-Res over the staged
    ``window_probs`` for biased graphs — the full row is inside the window
    for deg <= Dcap, so the top-k is the exact weighted reservoir).

    Returns SampledNeighbors-[L, k] aligned with the hop's seeds.
    """
    from dist_gnn_tpu.ops import prng
    from dist_gnn_tpu.ops.sampling import SampledNeighbors, sample_neighbors

    L = local_rows.shape[0]
    nb_hot = sample_neighbors(hot_graph, local_rows, k, False, key)

    M, Dcap = staged.window.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (M, k), 1)
    row_key = prng.random_keys(jax.random.fold_in(key, 1), (M,))
    deg_eff = jnp.minimum(staged.deg, Dcap)[:, None]
    if staged.window_probs is not None:
        # biased staged rows: Gumbel keys log(u)/w over the dense window,
        # top-k = exact A-Res (out-of-row / zero-weight slots at -inf)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, Dcap), 1)
        bits = prng.mix32(
            row_key[:, None] ^ prng.mix32(col.astype(jnp.uint32))
        )
        u = prng.bits_to_uniform(bits)
        w = jnp.where(
            (col < deg_eff) & (staged.window_probs > 0),
            staged.window_probs, 0.0,
        )
        gl = jnp.where(w > 0, jnp.log(u) / w, -jnp.float32(jnp.inf))
        from dist_gnn_tpu.ops.sampling import _topk_hier

        top_vals, sel = _topk_hier(gl, k)  # exact; PartialReduce lowering
        smask = (~staged.is_pre[:, None]) & (top_vals > -jnp.float32(jnp.inf))
    else:
        # uniform staged rows: k-of-deg Feistel draw over the dense window
        perm = prng.feistel_permutation(
            j, jnp.maximum(deg_eff, 1), row_key[:, None]
        )
        sel = jnp.where(deg_eff <= k, j, perm)
        smask = (~staged.is_pre[:, None]) & (j < jnp.minimum(deg_eff, k))
    # compare+mask+reduce selection (take_along_axis lowers to per-element
    # gather — see ops/sampling._window_fetch)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Dcap), 2)
    hitm = w_iota == jnp.clip(sel, 0, Dcap - 1)[:, :, None]
    ids_win = jnp.sum(jnp.where(hitm, staged.window[:, None, :], 0), axis=2)
    ids_m = jnp.where(staged.is_pre[:, None], staged.pre_ids, ids_win)
    mask_m = jnp.where(staged.is_pre[:, None], staged.pre_mask, smask)

    # scatter staged results back to seed positions (pad row_of = L drops)
    ids = jnp.where(nb_hot.mask, nb_hot.ids, INVALID_ID)
    mask = nb_hot.mask
    ids = jnp.full((L + 1, k), INVALID_ID, jnp.int32).at[:L].set(ids)
    mask = jnp.zeros((L + 1, k), bool).at[:L].set(mask)
    ids = ids.at[staged.row_of].set(
        jnp.where(mask_m, ids_m, INVALID_ID), mode="drop"
    )[:L]
    mask = mask.at[staged.row_of].set(mask_m, mode="drop")[:L]
    return SampledNeighbors(ids=ids, mask=mask)
