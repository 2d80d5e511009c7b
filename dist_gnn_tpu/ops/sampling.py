"""Rowwise neighbor sampling with static padded shapes.

TPU redesign of the reference CUDA samplers:

* uniform without replacement — reservoir kernel with AtomicMax
  (``src/sampling/cuda/rowwise_sampling.cu:47-104``) becomes evaluation of a
  keyed Feistel permutation of [0, degree) at slots 0..k-1: O(B*k) work,
  no atomics, exactly-distinct picks, degree-independent.
* uniform with replacement (``rowwise_sampling.cu:106-141``) — k independent
  ``bits % degree`` draws.
* biased (weighted) without replacement — the A-Res weighted reservoir with
  FAISS WarpSelect top-k (``src/sampling/cuda/rowwise_sampling_bias.cu:62-146``)
  becomes Gumbel-key top-k (argmax of log(u)/w over the row, identical
  distribution to keys u**(1/w)), streamed over fixed-size edge chunks.
* biased with replacement — warp-scan CDF + binary search
  (``rowwise_sampling_bias.cu:184-220``) becomes a chunked inverse-CDF scan.

Semantics parity: rows with degree <= k and replace=False return the full
neighbor list (degree clamp, ``rowwise_sampling.cu:16-45``); padded seed
slots (INVALID_ID) and zero-degree rows produce fully-masked outputs.

All outputs are fixed-shape ``[B, k]`` id tensors + boolean masks; invalid
slots hold INVALID_ID so downstream relabel/compaction can sort them to the
tail.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dist_gnn_tpu.graph import INVALID_ID, Graph
from dist_gnn_tpu.ops import prng


class SampledNeighbors(NamedTuple):
    ids: jnp.ndarray  # [B, k] int32 global neighbor ids, INVALID_ID padded
    mask: jnp.ndarray  # [B, k] bool
    # count of sampled slots that had to be masked out because a static
    # budget was exceeded (windowed big-row budget, alias sparse-path
    # shortfall).  0 on exact paths.  Never silently wrong: undersized
    # budgets are observable here and aggregated into trainer metrics.
    overflow: jnp.ndarray | int = 0


def _round_up8(x: int) -> int:
    return -(-int(x) // 8) * 8


def _row_extents(graph: Graph, seeds: jnp.ndarray):
    valid = seeds != INVALID_ID
    safe = jnp.where(valid, seeds, 0)
    if graph.indptr_pairs is not None:
        # one [B]-row gather of (start, end) pairs instead of two
        # elementwise indptr gathers: row gathers run ~108M rows/s on v5e
        # vs ~75M elements/s, so this halves-and-then-some the extent cost
        # at large B (probe_step15/16).
        pair = graph.indptr_pairs[safe]  # [B, 2]
        start = pair[:, 0]
        deg = (pair[:, 1] - start).astype(jnp.int32)
    else:
        start = graph.indptr[safe]
        deg = (graph.indptr[safe + 1] - start).astype(jnp.int32)
    deg = jnp.where(valid, deg, 0)
    return start, deg, valid


def _window_select_multi(
    arrays, num_edges: int, start, sel, mask, W: int, pairs=None
):
    """One window level over several row-aligned edge arrays at once:
    values for picks whose position falls inside the 2W-window at each
    row's start.  Returns ([vals [B, k] per array], covered [B, k]).

    View each edge array as [ceil(nnz/W), W]; any W-window starting at an
    arbitrary offset is covered by two adjacent rows.  2-D row gathers
    are the fast TPU gather shape (~52M slices/s); vmap(dynamic_slice)
    over a 1-D array lowers ~30x slower (measured 58 ms vs 1.3 ms here).
    In-window selection is a compare+mask+reduce — NOT take_along_axis,
    which lowers to a per-element gather (measured 5.1 ms vs 0.18 ms for
    this fused reduction at [33792, 256] pick 15); the hit mask is built
    once and shared across the arrays.

    ``pairs`` (optional, parallel to ``arrays``): a (C, rows_a) pair
    layout — the two 2W-aligned reshapes of the array concatenated
    (Graph.win_pair).  With it the window is ONE row gather instead of
    two: C[r0//2] when r0 is even, C[rows_a + (r0-1)//2] when odd
    (0.48 -> 0.27 ms at the bench hop-3 shape, probe_step15).
    """
    B, k = sel.shape
    n_rows = -(-num_edges // W)
    r0 = jnp.clip((start // W).astype(jnp.int32), 0, max(n_rows - 2, 0))
    adj = (start - (r0.astype(start.dtype) * W))[:, None] + sel  # [B, k]
    covered = mask & (adj < 2 * W)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * W), 2)
    hitmask = w_iota == jnp.clip(adj, 0, 2 * W - 1)[:, :, None]  # [B, k, 2W]
    wins, _ = _window_select_raw(arrays, num_edges, r0, W, pairs=pairs)
    vals = [
        jnp.sum(jnp.where(hitmask, win[:, None, :], 0), axis=2)
        for win in wins
    ]
    return vals, covered


def _window_select(graph: Graph, start, sel, mask, W: int):
    """Single-array (neighbor ids) wrapper of :func:`_window_select_multi`."""
    (ids,), covered = _window_select_multi(
        (graph.indices,), graph.num_edges, start, sel, mask, W
    )
    return ids, covered


def _compact_rows(start, sel, mask, rows_flag, R: int):
    """Compact flagged rows' (start, sel, mask) into a static budget R.
    Returns (big_start [R], big_sel [R, k], big_mask [R, k], inv_row [R],
    in_budget [B]).

    Gather formulation: only the scalar row index is scattered (B int32
    elements); the [R, k] payloads are then GATHERED through it.  The
    previous scatter formulation pushed two [B, k]-row scatters (0.7 ms at
    B=26624 on v5e) where this costs one cheap element scatter + two
    [R]-row gathers (R << B)."""
    B, k = sel.shape
    rank = jnp.cumsum(rows_flag.astype(jnp.int32)) - 1
    in_budget = rows_flag & (rank < R)
    slot = jnp.where(in_budget, rank, R)
    inv_row = (
        jnp.full((R + 1,), B, jnp.int32)
        .at[slot]
        .set(jnp.arange(B, dtype=jnp.int32), mode="drop")[:R]
    )
    filled = inv_row < B  # compact slots actually assigned a source row
    src = jnp.where(filled, inv_row, 0)
    big_start = jnp.where(filled, start[src], 0)
    big_sel = jnp.where(filled[:, None], sel[src], 0)
    big_mask = mask[src] & filled[:, None]
    return big_start, big_sel, big_mask, inv_row, in_budget


def _scatter_back_vals(vals_sub, mask_sub, inv_row, B: int):
    """Route a compacted level's results back to [B, k] via an R-row
    scatter (R small) instead of a B-row gather.  Unserved slots are 0."""
    k = mask_sub.shape[1]
    served = (
        jnp.zeros((B + 1, k), bool).at[inv_row].set(mask_sub, mode="drop")[:B]
    )
    outs = [
        jnp.zeros((B + 1, k), v.dtype)
        .at[inv_row]
        .set(jnp.where(mask_sub, v, 0), mode="drop")[:B]
        for v in vals_sub
    ]
    return outs, served


def _window_fetch_multi(
    arrays,  # tuple of [nnz] row-aligned edge arrays (ids/probs/alias...)
    num_edges: int,
    start: jnp.ndarray,  # [B] row starts (edge offsets)
    sel: jnp.ndarray,  # [B, k] sampled positions within each row
    mask: jnp.ndarray,  # [B, k]
    window,  # int W, or (W1, W2) two-level cascade
    big_row_budget,  # int, or (R1, R2) matching a (W1, W2) window
    pairs=None,  # optional per-array (C, rows_a) W1 pair layouts
    pairs2=None,  # optional per-array pair layouts at W2 (hub level)
):
    """Fetch ``a[start + sel]`` for every array in ``arrays`` using
    contiguous window gathers instead of B*k element gathers (TPU gather
    throughput is bounded by slice count — see ops/gather_pallas.py).

    Levels: picks inside the 2*W1 window are served by the [B, 2W1]
    gather; rows with farther picks (deg >~ W1) compact into budget R1 and
    are served by a wider 2*W2 window (hub rows are few, wide windows are
    byte-cheap); rows beyond W2 compact into R2 and are served
    elementwise-EXACTLY.  A single (W, R) pair keeps the old behavior:
    level-2 rows are served elementwise.  Overflow beyond the final budget
    is masked and returned as a count — never silently wrong.  Exactness:
    identical results to the elementwise path whenever budgets suffice
    (tested).

    Returns ([vals [B, k] per array — 0 where unserved], served [B, k],
    overflow count).
    """
    B, k = sel.shape
    nnz = max(num_edges - 1, 0)
    if isinstance(window, (tuple, list)):
        W1, W2 = window
        assert big_row_budget is not None, "cascade windows need budgets"
        R1, R2 = big_row_budget
    else:
        W1, W2 = window, None
        R1, R2 = big_row_budget, None
    if R1 is not None:
        # clamp to the hop's row count (see sample_biased_windowed): a
        # small hop can't overflow more rows than it has
        R1 = min(R1, _round_up8(B))
        if R2 is not None:
            R2 = min(R2, R1)

    vals, covered = _window_select_multi(
        arrays, num_edges, start, sel, mask, W1, pairs=pairs
    )

    uncovered_any = jnp.any(mask & ~covered, axis=1)  # [B]
    if R1 is None:
        # exact fallback: full elementwise gather merged in
        pos = jnp.clip(start[:, None] + sel.astype(start.dtype), 0, nnz)
        vals = [
            jnp.where(covered, v, a[pos]) for v, a in zip(vals, arrays)
        ]
        return vals, mask, jnp.int32(0)

    big_start, big_sel, big_mask, inv_row, _ = _compact_rows(
        start, sel, mask, uncovered_any, R1
    )

    if W2 is None:
        big_pos = jnp.clip(
            big_start[:, None] + big_sel.astype(start.dtype), 0, nnz
        )
        sub_vals = [a[big_pos] for a in arrays]  # [R1, k] exact
        sub_mask = big_mask
    else:
        # level 2: wider window over the compacted hub rows
        vals2, cov2 = _window_select_multi(
            arrays, num_edges, big_start, big_sel, big_mask, W2,
            pairs=pairs2,
        )
        unc2 = jnp.any(big_mask & ~cov2, axis=1)
        b2_start, b2_sel, b2_mask, inv2, _ = _compact_rows(
            big_start, big_sel, big_mask, unc2, R2
        )
        b2_pos = jnp.clip(
            b2_start[:, None] + b2_sel.astype(start.dtype), 0, nnz
        )
        b3_vals = [a[b2_pos] for a in arrays]  # [R2, k] exact elementwise
        vals3, served3 = _scatter_back_vals(b3_vals, b2_mask, inv2, R1)
        sub_vals = [
            jnp.where(cov2, v2, v3) for v2, v3 in zip(vals2, vals3)
        ]
        sub_mask = cov2 | served3

    from_big, served_big = _scatter_back_vals(sub_vals, sub_mask, inv_row, B)
    served = (covered | served_big) & mask
    vals = [
        jnp.where(covered, v, vb) for v, vb in zip(vals, from_big)
    ]
    overflow = jnp.sum((mask & ~served).astype(jnp.int32))
    return vals, served, overflow


def _window_fetch(
    graph: Graph,
    start: jnp.ndarray,  # [B] row starts (edge offsets)
    sel: jnp.ndarray,  # [B, k] sampled positions within each row
    mask: jnp.ndarray,  # [B, k]
    window,  # int W, or (W1, W2) two-level cascade
    big_row_budget,  # int, or (R1, R2) matching a (W1, W2) window
):
    """Neighbor-id specialization of :func:`_window_fetch_multi`."""
    w2 = window[1] if isinstance(window, (tuple, list)) else None
    (ids,), served, overflow = _window_fetch_multi(
        (graph.indices,), graph.num_edges, start, sel, mask, window,
        big_row_budget, pairs=_indices_pair(graph, window),
        pairs2=_indices_pair(graph, w2) if w2 else None,
    )
    return jnp.where(served, ids, INVALID_ID), served, overflow


def _indices_pair(graph: Graph, window):
    """(C, rows_a) pair layout for graph.indices when one was built at the
    matching W (Graph.win_pair / win_pair2); None otherwise.  On combined
    ids|probs layouts (win_pair_width == 2) the ids half is a column slice
    — XLA fuses the slice into the row gather, no copy."""
    w1 = window[0] if isinstance(window, (tuple, list)) else window
    if graph.win_pair is not None and graph.win_pair_w == w1:
        C = graph.win_pair
        if graph.win_pair_width == 2:
            C = C[:, : 2 * w1]
        return ((C, graph.win_pair_rows_a),)
    if graph.win_pair2 is not None and graph.win_pair2_w == w1:
        C = graph.win_pair2
        if graph.win_pair_width == 2:
            C = C[:, : 2 * w1]
        return ((C, graph.win_pair2_rows_a),)
    return None


def _bias_pair(graph: Graph, W: int):
    """(C, rows_a) COMBINED ids|probs pair layout at window W (rows are
    [ids 2W | probs-bits 2W]); None when not built."""
    if graph.win_pair_width != 2:
        return None
    if graph.win_pair is not None and graph.win_pair_w == W:
        return graph.win_pair, graph.win_pair_rows_a
    if graph.win_pair2 is not None and graph.win_pair2_w == W:
        return graph.win_pair2, graph.win_pair2_rows_a
    return None


@partial(jax.jit, static_argnames=("k", "replace", "window", "big_row_budget"))
def sample_uniform(
    graph: Graph,
    seeds: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    window: Optional[int] = None,
    big_row_budget: Optional[int] = None,
) -> SampledNeighbors:
    """Uniformly sample up to ``k`` in-neighbors per seed row.

    ``window`` enables the windowed-gather fast path (see
    :func:`_window_fetch`); None keeps the plain elementwise gather.
    Slots exceeding ``big_row_budget`` on the windowed path are masked and
    counted in the returned ``overflow`` field.

    Distinctness caveat (replace=False): picks come from a keyed Feistel
    permutation whose cycle-walk fallback breaks bijectivity with ~1e-3
    probability per element (ops/prng.feistel_permutation), so a row can
    very rarely contain a duplicate neighbor.  Downstream relabel dedups,
    so correctness holds; only sampling statistics carry the ~0.1% noise.
    """
    B = seeds.shape[0]
    start, deg, valid = _row_extents(graph, seeds)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)

    if replace:
        bits = prng.random_keys(key, (B, k))
        sel = prng.uniform_mod(bits, deg[:, None])
        mask = valid[:, None] & (deg[:, None] > 0)
    else:
        row_key = prng.random_keys(key, (B,))
        perm = prng.feistel_permutation(j, deg[:, None], row_key[:, None])
        take_all = deg[:, None] <= k
        sel = jnp.where(take_all, j, perm)
        mask = valid[:, None] & (j < jnp.minimum(deg[:, None], k))

    w1 = window[0] if isinstance(window, (tuple, list)) else window
    if window is not None and graph.num_edges > w1:
        ids, mask, ovf = _window_fetch(graph, start, sel, mask, window, big_row_budget)
        return SampledNeighbors(ids=ids, mask=mask, overflow=ovf)

    pos = start[:, None] + sel.astype(start.dtype)
    pos = jnp.clip(pos, 0, max(graph.num_edges - 1, 0))
    ids = jnp.where(mask, graph.indices[pos], INVALID_ID)
    return SampledNeighbors(ids=ids, mask=mask)


def _chunk_gather(arr, pos, in_range):
    pos = jnp.clip(pos, 0, arr.shape[0] - 1)
    return jnp.where(in_range, arr[pos], 0)


def _topk_hier(x: jnp.ndarray, k: int, chunk: int = 256):
    """Exact top-k: chunked cascade with ApproxTopK narrow passes.

    ``lax.top_k`` lowers to a variadic sort whose cost grows steeply with
    row width (4.8 ms at [5120, 2048] k=15; 0.96 at [26624, 256]).  Wide
    rows split into width-``chunk`` pieces, top-k each piece (top-k of
    the union of per-piece top-ks == global top-k), then top-k the
    candidates; positions are recovered with a one-hot select over the
    small candidate axis.  Each NARROW pass uses ``lax.approx_max_k``
    with ``recall_target=1.0``, which is EXACT (validated against top_k
    values AND positions on device — probe_bias3) and lowers to the TPU
    PartialReduce op: 0.44 vs 0.96 ms at [26624, 256], 0.69 vs 1.50 at
    [40960, 256].  NOTE a recall_target of 1.0 disables the width-
    reducing binning itself (``aggregate_to_topk=False`` returns L == W
    candidates — no exact wide partial reduce exists), so the chunk
    cascade stays; only the narrow engine changed.  Composite effect
    (probe_bias5, full biased sampler): 4.90 -> 4.40 ms at hop 3, while
    the pure-PartialReduce wide path REGRESSED to 8.1 — measured, not
    assumed.  Output order matches top_k (descending); tie positions may
    differ — consumers treat the k picks as a set.
    """
    B, W = x.shape
    if W <= 2 * chunk:
        return jax.lax.approx_max_k(x, k, recall_target=1.0)
    if W % chunk:
        return jax.lax.top_k(x, k)
    n = W // chunk
    kc = min(k, chunk)
    v1, p1 = jax.lax.approx_max_k(
        x.reshape(B * n, chunk), kc, recall_target=1.0
    )
    v1 = v1.reshape(B, n * kc)
    base = (
        jax.lax.broadcasted_iota(jnp.int32, (B, n, kc), 1) * chunk
    ).reshape(B, n * kc)
    p1g = p1.reshape(B, n * kc) + base  # global positions of candidates
    v2, p2 = jax.lax.approx_max_k(v1, k, recall_target=1.0)
    cand = jax.lax.broadcasted_iota(jnp.int32, (B, 1, n * kc), 2)
    hit = cand == p2[:, :, None]
    pos = jnp.sum(jnp.where(hit, p1g[:, None, :], 0), axis=2)
    return v2, pos


def _gumbel_window_level(
    graph: Graph,
    start: jnp.ndarray,  # [B] edge offsets of each row
    deg: jnp.ndarray,  # [B]
    row_mask: jnp.ndarray,  # [B] rows this level should serve
    k: int,
    row_key: jnp.ndarray,  # [B] uint32
    W: int,
    level_salt: int,
):
    """Exact A-Res (Gumbel-key top-k) over rows fully contained in their
    2W-aligned window.  Fetches each row's probs AND ids windows once
    ([B, 2W] row gathers), draws one uniform per in-row edge, and top-ks
    the Gumbel keys log(u)/w over the whole row — the reference's
    A-Res + WarpSelect semantics (rowwise_sampling_bias.cu:62-146) with
    no per-draw lookups.

    Returns (ids [B, k], sel [B, k] row offsets, got [B, k] valid mask,
    fits [B] rows fully served by this level).  Rows with
    start+deg crossing the window go unserved (fits=False) and must
    cascade to a wider level or the tail path.
    """
    B = start.shape[0]
    num_edges = graph.num_edges
    n_rows = -(-num_edges // W)
    r0 = jnp.clip((start // W).astype(jnp.int32), 0, max(n_rows - 2, 0))
    adj0 = (start - r0.astype(start.dtype) * W).astype(jnp.int32)  # [B]
    fits = row_mask & (adj0 + deg <= 2 * W) & (deg > 0)

    combo = _bias_pair(graph, W)
    if combo is not None:
        # ONE [B, 4W] row gather serves both ids and probs (row-gather cost
        # is per-slice, ~flat in width — NOTES.md §6): 3 fetched rows/seed
        # (ids pair + 2x probs) become 1
        C, rows_a = combo
        row = jnp.where(r0 % 2 == 0, r0 // 2, rows_a + (r0 - 1) // 2)
        both = C[row]
        wids = both[:, : 2 * W]
        wprob = jax.lax.bitcast_convert_type(both[:, 2 * W :], jnp.float32)
    else:
        pairs = _indices_pair(graph, W)
        (wids,), _ = _window_select_raw(
            (graph.indices,), num_edges, r0, W, pairs=pairs
        )
        (wprob,), _ = _window_select_raw((graph.probs,), num_edges, r0, W)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * W), 1)
    in_row = (col >= adj0[:, None]) & (col < (adj0 + deg)[:, None])
    bits = prng.mix32(
        row_key[:, None]
        ^ prng.mix32((col ^ jnp.int32(level_salt)).astype(jnp.uint32))
    )
    u = prng.bits_to_uniform(bits)
    w = jnp.where(in_row & fits[:, None], wprob, 0.0)
    gl = jnp.where(w > 0, jnp.log(u) / w, -jnp.float32(jnp.inf))
    top_vals, top_pos = _topk_hier(gl, k)  # positions within window
    got = (top_vals > -jnp.float32(jnp.inf)) & fits[:, None]
    # one-hot select of the picked ids (take_along_axis lowers to slow
    # per-element gathers; compare+mask+reduce is the fast shape)
    hit = col[:, None, :] == top_pos[:, :, None]  # [B, k, 2W]
    ids = jnp.sum(jnp.where(hit, wids[:, None, :], 0), axis=2)
    sel = top_pos - adj0[:, None]
    return ids, sel, got, fits


def _window_select_raw(arrays, num_edges, r0, W, pairs=None):
    """Fetch the [B, 2W] windows at row indices r0 for each array (the raw
    half of :func:`_window_select_multi`, shared by the Gumbel path)."""
    n_rows = -(-num_edges // W)
    need = n_rows * W
    pair = None
    outs = []
    for i, flat in enumerate(arrays):
        p = pairs[i] if pairs is not None else None
        if p is not None:
            C, rows_a = p
            row = jnp.where(r0 % 2 == 0, r0 // 2, rows_a + (r0 - 1) // 2)
            outs.append(C[row])
        else:
            if pair is None:
                pair = jnp.stack([r0, r0 + 1], axis=1)
            if flat.shape[0] < need:
                # fallback for unpadded arrays (sharded sub-CSRs etc.);
                # Graph.to_device pre-pads to a 4096 multiple so the hot
                # paths never pay this whole-array copy
                flat = jnp.concatenate(
                    [flat, jnp.zeros((need - flat.shape[0],), flat.dtype)]
                )
            outs.append(
                flat[:need].reshape(n_rows, W)[pair].reshape(
                    r0.shape[0], 2 * W
                )
            )
    return outs, n_rows


def _compact_rows_scalar(payloads, rows_flag, R: int):
    """Compact per-row scalar payloads of flagged rows into a static budget
    R (gather formulation — see :func:`_compact_rows`).  Returns
    (compacted payloads [R], inv_row [R], filled [R], in_budget [B])."""
    B = rows_flag.shape[0]
    rank = jnp.cumsum(rows_flag.astype(jnp.int32)) - 1
    in_budget = rows_flag & (rank < R)
    slot = jnp.where(in_budget, rank, R)
    inv_row = (
        jnp.full((R + 1,), B, jnp.int32)
        .at[slot]
        .set(jnp.arange(B, dtype=jnp.int32), mode="drop")[:R]
    )
    filled = inv_row < B
    src = jnp.where(filled, inv_row, 0)
    outs = [jnp.where(filled, p[src], 0) for p in payloads]
    return outs, inv_row, filled, in_budget


def _alias_distinct_tail(graph: Graph, start, deg, row_mask, k: int, row_key):
    """First-k-distinct successive alias draws for a (small, compacted) set
    of huge rows — elementwise lookups are fine at tail scale.  Equivalent
    in distribution to A-Res (Efraimidis–Spirakis).  Returns (ids [R, k],
    sel [R, k], got [R, k], shortfall count).

    Draw budget: tail rows have deg > 2*W2 (they fell through both window
    levels), so collisions among T draws are rare (E[collisions] <=
    T^2/2deg < 0.4 at T = 2k+8, deg >= 2048) — the probe_bias6 dissection
    showed the [R, T] alias-pair fetch is SLICE-COUNT bound (~52M
    slices/s), so halving T from the old 4k halves the tail's dominant
    cost; the shortfall counter still guards the (astronomically rare)
    under-draw."""
    R = start.shape[0]
    T = 2 * k + 8
    nnz = max(graph.num_edges - 1, 0)
    t_iota = jax.lax.broadcasted_iota(jnp.uint32, (R, T), 1)
    bits_slot = prng.mix32(row_key[:, None] ^ prng.mix32(t_iota * jnp.uint32(2654435769)))
    bits_u = prng.mix32(bits_slot ^ jnp.uint32(0x5BD1E995))
    j = prng.uniform_mod(bits_slot, deg[:, None])
    pos = jnp.clip(start[:, None] + j.astype(start.dtype), 0, nnz)
    if graph.alias_pack is not None:
        # one [R, T] row gather of (prob-bits, idx) pairs — half the
        # slices of the two separate elementwise gathers
        pk = graph.alias_pack[pos]  # [R, T, 2]
        pr = jax.lax.bitcast_convert_type(pk[:, :, 0], jnp.float32)
        al = pk[:, :, 1]
    else:
        pr = graph.alias_prob[pos]
        al = graph.alias_idx[pos]
    u = prng.bits_to_uniform(bits_u)
    draws = jnp.where(u < pr, j, al.astype(j.dtype))
    eq = draws[:, :, None] == draws[:, None, :]
    earlier = jnp.tril(jnp.ones((T, T), bool), k=-1)
    first = ~jnp.any(eq & earlier[None], axis=2) & row_mask[:, None]
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    take = first & (rank < k)
    # route draw -> slot with a one-hot select over the T axis (the 2-D
    # scatter this replaces cost ~0.8 ms at [1024, 60] — probe_bias1)
    jslots = jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)
    hit = take[:, None, :] & (rank[:, None, :] == jslots[:, :, None])
    sel = jnp.sum(
        jnp.where(hit, draws[:, None, :].astype(jnp.int32), 0), axis=2
    )
    got_n = jnp.sum(take.astype(jnp.int32), axis=1)
    got = (jslots < jnp.minimum(got_n, jnp.minimum(deg, k))[:, None]) & row_mask[:, None]
    pos_k = jnp.clip(start[:, None] + sel.astype(start.dtype), 0, nnz)
    ids = jnp.where(got, graph.indices[pos_k], INVALID_ID)
    # NB ``want`` counts ALL edges; a tail row with fewer than min(deg, k)
    # POSITIVE-weight edges reports a persistent shortfall (the alias
    # table never draws p = 0 edges) — conservative, nothing was wrongly
    # dropped; A-Res would also return fewer than k there
    want = jnp.where(row_mask, jnp.minimum(deg, k), 0)
    shortfall = jnp.sum(jnp.maximum(want - got_n, 0)).astype(jnp.int32)
    return ids, sel, got, shortfall


@partial(jax.jit, static_argnames=("k", "window", "big_row_budget"))
def sample_biased_windowed(
    graph: Graph,
    seeds: jnp.ndarray,
    k: int,
    key: jax.Array,
    window=(128, 1024),
    big_row_budget=(5120, 1024),
) -> SampledNeighbors:
    """Weighted without-replacement sampling via windowed Gumbel top-k.

    TPU-first redesign of the reference A-Res kernel
    (``src/sampling/cuda/rowwise_sampling_bias.cu:62-146``) that also
    replaces the per-draw alias lookups of :func:`sample_biased_alias`
    (measured 34 ms/hop at [26624, 15]: every draw needs an (alias_prob,
    alias_idx) fetch, each a 2W-wide masked select):

      * level 1: rows whose edge span fits their 2*W1-aligned window get
        the EXACT Gumbel-key top-k over the whole row from two [B, 2W1]
        row-gathers (probs + ids) — one fetch per row, not per draw;
      * level 2: the rest compact into R1 and repeat at 2*W2;
      * tail: rows bigger than 2*W2 compact into R2 and use first-k-
        distinct successive alias draws (elementwise is fine for ~1k hub
        rows); requires ``graph.alias_prob`` (HostGraph.to_device
        with_alias=True).

    All three levels are A-Res-equivalent in distribution, so the whole
    sampler matches the numpy A-Res oracle (tested).  Rows beyond the
    R1/R2 budgets are masked and counted in ``overflow`` — never silently
    wrong.
    """
    assert graph.probs is not None and graph.alias_prob is not None
    B = seeds.shape[0]
    W1, W2 = window if isinstance(window, (tuple, list)) else (window, None)
    R1, R2 = (
        big_row_budget if isinstance(big_row_budget, (tuple, list))
        else (big_row_budget, max(big_row_budget // 4, 1))
    )
    if W2 is None:
        W2, R2 = W1 * 8, max(R1 // 4, 1)
    # a hop can never compact more rows than it has: clamp the static
    # budgets to the hop's row count (lossless — overflow only shrinks).
    # Small hops otherwise pay the full-size L2/tail levels: B=512 with
    # R1=5120 ran a [5120, 2048] Gumbel+top-k for at most 512 live rows.
    R1 = min(R1, _round_up8(B))
    R2 = min(R2, R1)
    start, deg, valid = _row_extents(graph, seeds)
    row_key = prng.random_keys(key, (B,))

    ids1, sel1, got1, fits1 = _gumbel_window_level(
        graph, start, deg, valid, k, row_key, W1, 0x1111
    )

    rest1 = valid & ~fits1 & (deg > 0)
    (c_start, c_deg, c_key), inv1, filled1, in_b1 = _compact_rows_scalar(
        (start, deg, row_key), rest1, R1
    )
    ids2, sel2, got2, fits2 = _gumbel_window_level(
        graph, c_start, c_deg.astype(jnp.int32), filled1, k,
        c_key.astype(jnp.uint32), W2, 0x2222,
    )

    rest2 = filled1 & ~fits2 & (c_deg > 0)
    (t_start, t_deg, t_key), inv2, filled2, in_b2 = _compact_rows_scalar(
        (c_start, c_deg, c_key), rest2, R2
    )
    ids3, sel3, got3, short3 = _alias_distinct_tail(
        graph, t_start, t_deg.astype(jnp.int32), filled2, k,
        t_key.astype(jnp.uint32),
    )

    # scatter tail into level-2 shape, then level-2 into [B, k]
    (ids2b, sel2b), served3 = _scatter_back_vals(
        (jnp.where(got3, ids3, 0), sel3), got3, inv2, R1
    )
    ids2m = jnp.where(got2, ids2, ids2b)
    sel2m = jnp.where(got2, sel2, sel2b)
    got2m = got2 | served3
    (ids1b, sel1b), served2 = _scatter_back_vals(
        (jnp.where(got2m, ids2m, 0), sel2m), got2m, inv1, B
    )
    ids = jnp.where(got1, ids1, ids1b)
    mask = got1 | served2
    ids = jnp.where(mask, ids, INVALID_ID)

    # overflow = picks lost to the static R1/R2 budgets (+ tail shortfall);
    # zero-weight/empty rows legitimately produce no picks and don't count
    drop1 = jnp.where(rest1 & ~in_b1, jnp.minimum(deg, k), 0)
    drop2 = jnp.where(rest2 & ~in_b2, jnp.minimum(c_deg.astype(jnp.int32), k), 0)
    overflow = (
        jnp.sum(drop1).astype(jnp.int32)
        + jnp.sum(drop2).astype(jnp.int32)
        + short3
    )
    return SampledNeighbors(ids=ids, mask=mask, overflow=overflow)


@partial(jax.jit, static_argnames=("k", "replace", "chunk"))
def sample_biased(
    graph: Graph,
    seeds: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    chunk: int = 256,
) -> SampledNeighbors:
    """Weighted neighbor sampling (per-edge ``graph.probs`` weights).

    Streams each row's edges in fixed chunks (static trip count derived from
    ``graph.max_degree``), maintaining either a running Gumbel top-k
    (without replacement) or a chunked inverse-CDF search (with
    replacement).  Equivalent in distribution to the reference's A-Res /
    CDF kernels but with no warp primitives and no per-row scratch arrays.
    """
    assert graph.probs is not None, "sample_biased requires graph.probs"
    B = seeds.shape[0]
    start, deg, valid = _row_extents(graph, seeds)
    num_chunks = max(1, -(-graph.max_degree // chunk))
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (B, chunk), 1)

    if not replace:
        # Gumbel keys: argmax_k of log(u)/w  ==  A-Res keys u**(1/w) top-k.
        row_key = prng.random_keys(key, (B,))
        neg_inf = jnp.float32(-jnp.inf)

        def body(c, carry):
            best_keys, best_ids = carry
            off = c * chunk + e_iota
            in_row = off < deg[:, None]
            pos = start[:, None] + off.astype(start.dtype)
            w = _chunk_gather(graph.probs, pos, in_row)
            ids = _chunk_gather(graph.indices, pos, in_row)
            # per-(row, edge) uniform draw keyed by (row_key, edge offset)
            bits = prng.mix32(row_key[:, None].astype(jnp.uint32) ^ prng.mix32(off.astype(jnp.uint32)))
            u = prng.bits_to_uniform(bits)
            gkey = jnp.where(in_row & (w > 0), jnp.log(u) / w, neg_inf)
            cat_keys = jnp.concatenate([best_keys, gkey], axis=1)
            cat_ids = jnp.concatenate([best_ids, ids], axis=1)
            top_keys, top_idx = jax.lax.top_k(cat_keys, k)
            top_ids = jnp.take_along_axis(cat_ids, top_idx, axis=1)
            return top_keys, top_ids

        init = (jnp.full((B, k), neg_inf), jnp.zeros((B, k), jnp.int32))
        best_keys, best_ids = jax.lax.fori_loop(0, num_chunks, body, init)
        mask = valid[:, None] & (best_keys > neg_inf)
        ids = jnp.where(mask, best_ids, INVALID_ID)
        return SampledNeighbors(ids=ids, mask=mask)

    # With replacement: two-pass chunked inverse CDF.
    def total_body(c, acc):
        off = c * chunk + e_iota
        in_row = off < deg[:, None]
        pos = start[:, None] + off.astype(start.dtype)
        w = _chunk_gather(graph.probs, pos, in_row)
        return acc + jnp.sum(w, axis=1)

    total_w = jax.lax.fori_loop(0, num_chunks, total_body, jnp.zeros((B,), jnp.float32))

    u = prng.bits_to_uniform(prng.random_keys(key, (B, k))) * total_w[:, None]

    def locate_body(c, carry):
        cum_before, picked, found = carry
        off = c * chunk + e_iota
        in_row = off < deg[:, None]
        pos = start[:, None] + off.astype(start.dtype)
        w = _chunk_gather(graph.probs, pos, in_row)
        ids = _chunk_gather(graph.indices, pos, in_row)
        csum = jnp.cumsum(w, axis=1)  # [B, chunk]
        chunk_total = csum[:, -1]
        # draw t lands in this chunk if cum_before <= u_t < cum_before + chunk_total
        local = u - cum_before[:, None]  # [B, k]
        # first index with csum > local  (i.e. local < csum[idx])
        idx = jnp.sum((csum[:, None, :] <= local[:, :, None]).astype(jnp.int32), axis=2)
        in_chunk = (~found) & (local >= 0) & (local < chunk_total[:, None]) & (idx < chunk)
        sel_ids = jnp.take_along_axis(ids, jnp.clip(idx, 0, chunk - 1), axis=1)
        picked = jnp.where(in_chunk, sel_ids, picked)
        found = found | in_chunk
        return cum_before + chunk_total, picked, found

    init = (
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B, k), jnp.int32),
        jnp.zeros((B, k), jnp.bool_),
    )
    _, picked, found = jax.lax.fori_loop(0, num_chunks, locate_body, init)
    mask = valid[:, None] & (total_w[:, None] > 0) & found
    ids = jnp.where(mask, picked, INVALID_ID)
    return SampledNeighbors(ids=ids, mask=mask)


@partial(jax.jit, static_argnames=("k", "replace", "window", "big_row_budget"))
def sample_biased_alias(
    graph: Graph,
    seeds: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    window=None,
    big_row_budget=None,
) -> SampledNeighbors:
    """Weighted sampling via per-row Walker alias tables — O(B*k) draws.

    Requires ``graph.alias_prob``/``alias_idx`` (HostGraph.build_alias_tables,
    native csrc/dg_build_alias).  A draw is: j ~ U[0, deg); accept j if
    u < prob[j] else take alias[j] — one 8-byte gather per draw, replacing
    the O(degree) CDF scan / A-Res pass of both the reference kernels and
    the chunked :func:`sample_biased`.

    ``replace=False`` uses successive distinct draws, which by the
    Efraimidis–Spirakis equivalence has the same distribution as A-Res
    weighted reservoir sampling.  Rows with deg <= 2k instead use exact
    Gumbel top-k over the (short) row.  Successive drawing uses 4k
    attempts; shortfall slots (astronomically rare for deg > 2k) are
    masked, never silently wrong.
    """
    assert graph.alias_prob is not None and graph.alias_idx is not None
    B = seeds.shape[0]
    start, deg, valid = _row_extents(graph, seeds)
    nnz = max(graph.num_edges - 1, 0)

    w1 = window[0] if isinstance(window, (tuple, list)) else window
    windowed = window is not None and graph.num_edges > w1

    def fetch(arrays, pos_in_row, m, pairs=None):
        """arrays[i][start + pos_in_row], windowed when enabled.
        Returns (vals list, served mask, overflow count)."""
        if windowed:
            return _window_fetch_multi(
                arrays, graph.num_edges, start, pos_in_row, m, window,
                big_row_budget, pairs=pairs,
            )
        pos = jnp.clip(start[:, None] + pos_in_row.astype(start.dtype), 0, nnz)
        return [a[pos] for a in arrays], m, jnp.int32(0)

    def alias_draw(bits_slot, bits_u, m):
        """One weighted draw per element → edge offset within the row."""
        j = prng.uniform_mod(bits_slot, deg[:, None])
        (pr, al), served, ovf = fetch(
            (graph.alias_prob, graph.alias_idx), j, m
        )
        u = prng.bits_to_uniform(bits_u)
        return jnp.where(u < pr, j, al.astype(j.dtype)), served, ovf

    if replace:
        bits = prng.random_keys(key, (2, B, k))
        m0 = jnp.broadcast_to(valid[:, None] & (deg[:, None] > 0), (B, k))
        sel, served_d, ovf_d = alias_draw(bits[0], bits[1], m0)
        (idv,), served_i, ovf_i = fetch(
            (graph.indices,), sel, served_d, pairs=_indices_pair(graph, window)
        )
        mask = m0 & served_i
        ids = jnp.where(mask, idv, INVALID_ID)
        return SampledNeighbors(
            ids=ids, mask=mask, overflow=(ovf_d + ovf_i).astype(jnp.int32)
        )

    T = 4 * k
    bits = prng.random_keys(key, (2, B, T))
    mT = jnp.broadcast_to(valid[:, None] & (deg[:, None] > 0), (B, T))
    draws, served_T, ovf_d = alias_draw(bits[0], bits[1], mT)
    # [B, T] row offsets; budget-dropped draws are excluded below

    # dense-row exact path: deg <= 2k → Gumbel top-k over the whole row
    D = 2 * k
    off = jax.lax.broadcasted_iota(jnp.int32, (B, D), 1)
    in_row = off < jnp.minimum(deg[:, None], D)
    (wv,), served_w, ovf_w = fetch((graph.probs,), off, in_row)
    w = jnp.where(in_row & served_w, wv, 0.0)
    gkey = jax.random.fold_in(key, 1)
    gu = prng.bits_to_uniform(prng.random_keys(gkey, (B, D)))
    glog = jnp.where(in_row & (w > 0), jnp.log(gu) / w, -jnp.inf)
    _, top_off = jax.lax.top_k(glog, k)  # offsets into the row
    dense_valid = jnp.take_along_axis(glog, top_off, axis=1) > -jnp.inf

    # sparse-row path: first k distinct among T successive draws
    eq = draws[:, :, None] == draws[:, None, :]  # [B, T, T]
    earlier = jnp.tril(jnp.ones((T, T), bool), k=-1)
    dup = jnp.any(eq & earlier[None], axis=2)
    first = ~dup & served_T
    rank = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
    take = first & (rank < k)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
    # non-taken draws must scatter OUT OF BOUNDS (dropped), not to (0, 0) —
    # they used to clobber row 0 slot 0 with offset 0
    sel_sparse = (
        jnp.zeros((B, k), jnp.int32)
        .at[jnp.where(take, row_i, B), jnp.where(take, rank, 0)]
        .set(draws.astype(jnp.int32), mode="drop")
    )
    got = jnp.sum(take.astype(jnp.int32), axis=1)  # distinct draws found
    jslots = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    sparse_valid = jslots < got[:, None]

    # deg <= k rows take the dense Gumbel path too (NOT a copy-all
    # shortcut): exact top-k over the row keeps zero-weight edges OUT
    # (glog = -inf), matching sample_biased/_windowed and the A-Res
    # semantics — a jslots copy-all used to return p = 0 edges as valid
    # neighbors on exactly these rows
    is_dense = deg[:, None] <= D
    sel = jnp.where(is_dense, top_off, sel_sparse)
    smask = jnp.where(is_dense, dense_valid, sparse_valid)
    mask = valid[:, None] & smask
    (idv,), served_i, ovf_i = fetch(
        (graph.indices,), sel, mask, pairs=_indices_pair(graph, window)
    )
    mask = mask & served_i
    ids = jnp.where(mask, idv, INVALID_ID)
    # sparse-path shortfall (fewer than k distinct draws in T attempts on a
    # deg > 2k row — or draws lost to window budgets) is rare but
    # observable, not silent
    # NB a deg > 2k row with fewer than k POSITIVE-weight edges reports a
    # persistent shortfall (the alias table never draws p = 0 edges, so
    # got saturates at the positive count) — conservative: nothing was
    # wrongly dropped, A-Res would also return fewer than k there
    sparse_row = valid & (deg > D)
    shortfall = jnp.sum(
        jnp.where(sparse_row, jnp.maximum(k - got, 0), 0)
    ).astype(jnp.int32)
    return SampledNeighbors(
        ids=ids,
        mask=mask,
        overflow=(shortfall + ovf_w + ovf_i).astype(jnp.int32),
    )


def sample_neighbors(
    graph: Graph,
    seeds: jnp.ndarray,
    k: int,
    replace: bool,
    key: jax.Array,
    biased: Optional[bool] = None,
    window: Optional[int] = None,
    big_row_budget: Optional[int] = None,
) -> SampledNeighbors:
    """Dispatch uniform/biased on ``graph.probs`` like the reference sampler
    (``src/sampling/sampler.cc:77-79``)."""
    if biased is None:
        biased = graph.probs is not None
    if biased:
        w1 = window[0] if isinstance(window, (tuple, list)) else window
        if (
            not replace
            and window is not None
            and big_row_budget is not None
            and graph.alias_prob is not None
            and graph.probs is not None
            and graph.num_edges > (w1 or 0)
        ):
            # windowed Gumbel top-k: one probs/ids window fetch per row
            # instead of per draw — the fast biased path (probe_step20:
            # alias per-draw fetches cost 34 ms/hop at [26624, 15])
            return sample_biased_windowed(
                graph, seeds, k, key,
                window=window, big_row_budget=big_row_budget,
            )
        if graph.alias_prob is not None:
            return sample_biased_alias(
                graph, seeds, k, replace, key,
                window=window, big_row_budget=big_row_budget,
            )
        return sample_biased(graph, seeds, k, replace, key)
    return sample_uniform(
        graph, seeds, k, replace, key, window=window, big_row_budget=big_row_budget
    )
