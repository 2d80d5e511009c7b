"""Full-graph layer-wise inference.

Counterpart of the reference's ``SAGE.inference``
(``example/graphsage/utils/models.py:57-97``): instead of sampling, each
layer is evaluated over *all* nodes with their full neighborhoods, one
layer at a time, so the deep representation has no sampling noise (the
standard protocol for final validation/test accuracy).

TPU shape: per layer, iterate over fixed-size *destination node chunks*;
a chunk's in-edges form a contiguous CSC span, so the edge walk is chunked
contiguous loads (no random structure access), and aggregation is
``segment_sum`` keyed by a vectorised binary search of edge offsets into
the chunk's indptr slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import HostGraph


def _span_rows(local_ptr, base, n: int, num_dst: int):
    """Dst-row index for the edge offsets [base, base + n).

    CSC rows are a monotone step function of the edge offset: scatter
    each row's start offset into the chunk and take a running max
    (``cummax``).  Replaces ``searchsorted``'s 13-pass binary search,
    which was THE span-inference bottleneck (probe_inf3: 3.3 of 3.9 ms
    per 32768-edge chunk; this form is one ~num_dst-element scatter + a
    [n] scan).  Offsets before the first in-chunk boundary belong to the
    row covering ``base`` — one scalar searchsorted.  Duplicate starts
    (empty rows) keep the max row id, matching searchsorted-right - 1.
    """
    rel = (local_ptr - base).astype(jnp.int32)
    # negative indices WRAP under mode='drop' (jax scatter semantics) —
    # route starts before the chunk to the explicit OOB slot n so they are
    # dropped, instead of relying on the wrapped marks being dominated by
    # the row0 maximum (round-3 ADVICE #1)
    rel = jnp.where(rel < 0, n, rel)
    mark = (
        jnp.full((n,), -1, jnp.int32)
        .at[rel]
        .max(
            jnp.arange(local_ptr.shape[0], dtype=jnp.int32), mode="drop"
        )
    )
    row0 = (jnp.searchsorted(local_ptr, base, side="right") - 1).astype(
        jnp.int32
    )
    rows = jnp.maximum(jax.lax.cummax(mark, axis=0), row0)
    return jnp.clip(rows, 0, num_dst - 1)


@partial(jax.jit, donate_argnums=(0,))
def _acc_sum_slab(acc, local_ptr, off0, src_feats, n_valid):
    """One staged edge slab of neighbor-sum accumulation: src_feats [E, F]
    were gathered HOST-side for edges [off0, off0+n_valid); rows derive
    from the absolute offsets via searchsorted into the chunk's indptr
    slice.  Device state is O(num_dst * F + E * F) only."""
    E = src_feats.shape[0]
    valid = jnp.arange(E) < n_valid
    rows = _span_rows(local_ptr, off0, E, acc.shape[0])
    msg = jnp.where(valid[:, None], src_feats, 0)
    return acc + jax.ops.segment_sum(
        msg, rows, num_segments=acc.shape[0], indices_are_sorted=True
    )


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _gat_acc_slab(
    m, s, acc, local_ptr, off0, z_src, er_src, el_dst, n_valid, negative_slope
):
    """One staged slab of online-softmax attention accumulation
    (flash-style renormalisation, the host-staged sibling of the
    one-program online walk in :func:`_gat_online_all_edges`: z/er arrive
    per slab instead of as device-resident [N, ...] state)."""
    E, H, d = z_src.shape
    num_dst = el_dst.shape[0]
    neg = jnp.float32(-1e30)
    valid = jnp.arange(E) < n_valid
    rows = _span_rows(local_ptr, off0, E, num_dst)
    score = jax.nn.leaky_relu(
        (el_dst[rows] + er_src).astype(jnp.float32), negative_slope
    )
    score = jnp.where(valid[:, None], score, neg)
    m_c = jax.ops.segment_max(score, rows, num_segments=num_dst)
    m_new = jnp.maximum(m, m_c)
    scale = jnp.exp(m - m_new)
    w = jnp.where(valid[:, None], jnp.exp(score - m_new[rows]), 0.0)
    s = s * scale + jax.ops.segment_sum(w, rows, num_segments=num_dst)
    contrib = jax.ops.segment_sum(
        w[:, :, None] * z_src.astype(jnp.float32), rows, num_segments=num_dst
    )
    acc = acc * scale[..., None] + contrib
    return m_new, s, acc


def full_graph_inference_host(
    model,
    params,
    hg: HostGraph,
    host_features: np.ndarray,
    node_chunk: int = 4096,
    edge_chunk: int = 1 << 14,
) -> np.ndarray:
    """Full-graph layer-wise inference in the HOST-RESIDENT regime
    (round-2 VERDICT #6): features AND per-layer activations live in host
    RAM (numpy or np.memmap — no [N, *] array ever touches HBM).

    The reference's layer-wise inference reads features from pinned host
    memory over UVA inside the kernel
    (``example/graphsage/utils/models.py:57-97``); the TPU analog stages
    each destination chunk's edge span slab-by-slab: the slab's source
    activations are gathered host-side (csrc gather_rows) and shipped with
    one async device_put, the device runs segment-sum / online-softmax
    accumulation with state bounded by O(node_chunk*F + edge_chunk*F).

    Supports SAGE (mean), GCN (true-degree symmetric norm), GAT
    (flash-style online softmax across slabs).  Returns [N, C] numpy.
    """
    from dist_gnn_tpu.utils import native

    N = hg.num_nodes
    indptr_np = np.asarray(hg.indptr, np.int64)
    deg_np = np.diff(indptr_np)
    h_host = host_features  # never uploaded wholesale
    is_gat = hasattr(model, "_project")
    is_gcn = (not is_gat) and not hasattr(model, "_layer_forward")
    if is_gcn:
        inv_sqrt_np = (1.0 / np.sqrt(deg_np + 1)).astype(np.float32)

    ptr_pad_dt = np.int64
    for l in range(len(model.dims)):
        p = params[f"layer{l}"]
        if is_gat:
            d_out, last = model.dims[l][1], model.dims[l][2]
            H = model.num_heads
            out_dim = model.dims[l][1] * (1 if last else H)
        else:
            d_out = model.dims[l][1]
            out_dim = d_out
        out_host = np.empty((N, out_dim), np.float32)
        F = h_host.shape[1]
        for lo in range(0, N, node_chunk):
            num = min(node_chunk, N - lo)
            e_lo = int(indptr_np[lo])
            e_hi = int(indptr_np[lo + num])
            # padded local indptr: tail rows get degree 0
            lptr = np.full(node_chunk + 1, e_hi, ptr_pad_dt)
            lptr[: num + 1] = indptr_np[lo : lo + num + 1]
            lptr_d = jnp.asarray(lptr)
            h_self = np.zeros((node_chunk, F), np.float32)
            h_self[:num] = h_host[lo : lo + num]
            if is_gat:
                h_self_d = jnp.asarray(h_self)
                z_self, el_self, _ = model._project(p, h_self_d, d_out)
                m = jnp.full((node_chunk, H), jnp.float32(-1e30))
                s = jnp.zeros((node_chunk, H), jnp.float32)
                acc = jnp.zeros((node_chunk, H, d_out), jnp.float32)
            else:
                acc = jnp.zeros((node_chunk, F), jnp.float32)
            for b0 in range(e_lo, e_hi, edge_chunk):
                n_valid = min(edge_chunk, e_hi - b0)
                src = np.zeros(edge_chunk, np.int32)
                src[:n_valid] = hg.indices[b0 : b0 + n_valid]
                buf = np.zeros((edge_chunk, F), np.float32)
                native.gather_rows(h_host, src[:n_valid], out=buf[:n_valid])
                if is_gcn:
                    buf[:n_valid] *= inv_sqrt_np[src[:n_valid], None]
                if is_gat:
                    z_src, _, er_src = model._project(
                        p, jnp.asarray(buf), d_out
                    )
                    m, s, acc = _gat_acc_slab(
                        m, s, acc, lptr_d, jnp.asarray(np.int64(b0)),
                        z_src.reshape(edge_chunk, H, d_out), er_src,
                        el_self, jnp.asarray(np.int32(n_valid)),
                        jnp.float32(model.negative_slope),
                    )
                else:
                    acc = _acc_sum_slab(
                        acc, lptr_d, jnp.asarray(np.int64(b0)),
                        jnp.asarray(buf), jnp.asarray(np.int32(n_valid)),
                    )
            deg_c = jnp.asarray(
                np.maximum(deg_np[lo : lo + num], 1).astype(np.float32)
            )
            if is_gat:
                agg = (acc / jnp.maximum(s, 1e-12)[..., None]).astype(
                    jnp.float32
                )[:num]
                out = model._combine(p, agg, d_out, last)
            elif is_gcn:
                inv_dst = jnp.asarray(inv_sqrt_np[lo : lo + num])
                agg = acc[:num] * inv_dst[:, None] + jnp.asarray(
                    h_self[:num]
                ) * (inv_dst**2)[:, None]
                out = (
                    jnp.dot(agg, p["w"].astype(agg.dtype),
                            preferred_element_type=jnp.float32)
                    + p["b"]
                ).astype(jnp.float32)
            else:
                h_mean = acc[:num] / deg_c[:, None]
                out = model._layer_forward(
                    p, jnp.asarray(h_self[:num]), h_mean
                )
            if not is_gat and l != len(model.dims) - 1:
                out = jax.nn.relu(out)
            out_host[lo : lo + num] = np.asarray(out, np.float32)
        h_host = out_host
    return h_host


# per-graph serving prep (see full_graph_inference): id(hg) -> (key, arrays)
_PREP_CACHE: dict = {}


@partial(jax.jit, static_argnames=("num_nodes", "nnz"))
def _edge_rows(indptr, num_nodes: int, nnz: int):
    """Static edge→dst-row map [nnz_pad]: scatter each row's start offset,
    forward-fill with ``cummax`` (rows are a monotone step function of the
    edge offset — same trick as :func:`_span_rows`, but computed ONCE per
    graph instead of per chunk).  NB the [nnz] result is padded to chunk
    granularity by the caller with fill -1 (``_pad_edges(erows, ..., -1)``);
    padded slots are always masked by the chunk's ``e_cnt`` before use."""
    starts = indptr[:-1].astype(jnp.int32)
    ids = jnp.arange(num_nodes, dtype=jnp.int32)
    mark = jnp.full((nnz,), -1, jnp.int32).at[starts].max(ids, mode="drop")
    return jax.lax.cummax(mark, axis=0)


def _pad_edges(arr, edge_chunk: int, fill):
    nnz = arr.shape[0]
    pad = edge_chunk + ((-nnz) % edge_chunk)
    return jnp.concatenate([arr, jnp.full((pad,), fill, arr.dtype)])


def _span_chunks(indptr_np, edge_chunk: int, span: int):
    """Host-side static chunk plan: each chunk covers <= ``edge_chunk``
    edges AND <= ``span`` destination rows, so the per-chunk segment ops
    write a small [span+1, F] partial (VMEM-friendly — a full-[N]
    scatter-add measured ~4 ms/chunk on TPU, the old 0.3 ms/chunk
    segment_sum shape restored) that a dynamic_update_slice folds into
    the accumulator.  Rows larger than edge_chunk split mid-row (their
    partials add across chunks; the GAT online-softmax rescale handles
    the split exactly).  Returns (e_base, e_cnt, row_lo) int32 arrays."""
    N = len(indptr_np) - 1
    nnz = int(indptr_np[-1])
    e_base, e_cnt, row_lo = [], [], []
    e = 0
    while e < nnz:
        r = int(np.searchsorted(indptr_np, e, side="right")) - 1
        r_end = min(r + span, N)
        e_next = min(e + edge_chunk, int(indptr_np[r_end]))
        if e_next <= e:  # huge row: split mid-row (span 1)
            e_next = min(e + edge_chunk, nnz)
        e_base.append(e)
        e_cnt.append(e_next - e)
        row_lo.append(r)
        e = e_next
    return (
        np.asarray(e_base, np.int32),
        np.asarray(e_cnt, np.int32),
        np.asarray(row_lo, np.int32),
    )


@partial(jax.jit, static_argnames=("edge_chunk", "span", "n_out"))
def _sum_all_edges(
    indices_p, erows_p, e_base, e_cnt, row_lo, h, scale_src,
    edge_chunk: int, span: int, n_out: int,
):
    """Neighbor-sum over ALL edges in ONE program: fori over the static
    span-bounded chunk plan; each chunk segment-sums its messages into a
    [span+1, F] partial (sorted local rows) and folds it into the
    accumulator with a read-modify-write slice.

    Replaces the per-node-chunk host loop (62 chunks × 3 layers × ~1.5-7 ms
    tunnel dispatch each) with ONE dispatch per layer.  ``scale_src``:
    optional [N] per-source scale (GCN's 1/sqrt(deg+1)); None for sums."""
    F = h.shape[1]
    n_chunks = e_base.shape[0]

    def body(c, acc):
        base = e_base[c]
        lo = row_lo[c]
        src = jax.lax.dynamic_slice(indices_p, (base,), (edge_chunk,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (edge_chunk,))
        valid = jnp.arange(edge_chunk, dtype=jnp.int32) < e_cnt[c]
        local = jnp.where(valid, rows - lo, span)
        msg = h[src]
        if scale_src is not None:
            msg = msg * scale_src[src][:, None].astype(msg.dtype)
        msg = jnp.where(valid[:, None], msg, 0)
        # segment-sum as a one-hot MXU matmul: [E, span+1]^T @ [E, F].
        # The scatter/segment_sum form measured ~2.5 ms/chunk on TPU (per-
        # update cost); the one-hot contraction is ~1 GF of MXU work.
        # Row monotonicity makes the one-hot a banded 0/1 matrix; products
        # are exact, accumulation is f32.
        oh = (
            local[:, None]
            == jnp.arange(span + 1, dtype=jnp.int32)[None, :]
        ).astype(msg.dtype)
        part = jax.lax.dot_general(
            oh, msg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cur = jax.lax.dynamic_slice(acc, (lo, 0), (span + 1, F))
        return jax.lax.dynamic_update_slice(acc, cur + part, (lo, 0))

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((n_out + span + 1, F), jnp.float32)
    )
    return acc[:n_out]


@partial(jax.jit, static_argnames=("edge_chunk", "span", "n_out", "negative_slope"))
def _gat_online_all_edges(
    indices_p, erows_p, e_base, e_cnt, row_lo, zer, el,
    edge_chunk: int, span: int, n_out: int, negative_slope: float,
):
    """GAT serving in ONE edge walk (round-5): online (flash-style)
    softmax over the static span-chunk plan, carrying (m, s, acc) and
    rescaling only the chunk's [span+1, *] slices.

    The round-4 engine made TWO walks (max+denominator, then weighted
    accumulate) with three random row gathers per chunk (er twice, z
    once); every pass of every serving engine on this chip is bound by
    the same ~105M rows/s gather ceiling (NOTES), so GAT served at half
    SAGE's rate purely from walking edges twice.  This walk gathers ONE
    combined table ``zer = [z | er]`` [N, H*d + H] per chunk (per-ROW
    gather pricing makes the extra H columns free).

    The carry is a running per-(row, head) **logsumexp** rather than the
    textbook (max, sum) pair: the online-softmax algebra is exact for ANY
    monotone per-row shift sequence, and ``logaddexp`` of the chunk's
    partial lse (= chunk max + log of the one-hot weight-sum matmul the
    accumulate needs anyway) replaces the per-row segment-max — the H
    stacked [E, span+1] masked reduces that cost ~0.09 ms/chunk in the
    (max, sum) form (probe_inf11: 48.1M e/s with them, see log).  The
    final division also vanishes: weights are exp(score - lse_final), so
    each row's weights sum to exactly 1.

    Numerics caveat: partial weights are exp(score - chunk_head_max), so
    a row whose within-chunk scores sit > ~85 (f32 exp underflow) below
    the SAME chunk's per-head max loses that chunk's mass.  Attention
    logits are leaky_relu'd sums of two bounded projections; an 85-logit
    spread inside one 512-row span is far outside anything a trained GAT
    produces (the oracle tests cover trained-scale weights).  The (max,
    sum) form had the same failure mode one level up (its exp(score -
    running_max) underflows identically for cross-chunk spreads).

    Mid-row chunk splits are exact: ``logaddexp`` folds partial sums
    across chunks like any other segment boundary.  Returns
    (acc [n_out, H*d] f32 — the FINISHED weighted mean, rows with no
    valid edges all-zero; lse [n_out, H] f32 for introspection).
    """
    HD_H = zer.shape[1]
    H = el.shape[1]
    HD = HD_H - H
    d = HD // H
    n_chunks = e_base.shape[0]
    neg = jnp.float32(-1e30)
    el = jnp.concatenate([el, jnp.zeros((span + 1, H), el.dtype)], axis=0)
    # head→columns expander for broadcasting [*, H] factors over each
    # head's d-block without an [*, H, d] reshape (Mosaic relayout trap)
    expander = (
        jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // d
        == jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
    )

    def body(c, carry):
        lse, acc = carry
        base = e_base[c]
        lo = row_lo[c]
        src = jax.lax.dynamic_slice(indices_p, (base,), (edge_chunk,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (edge_chunk,))
        valid = jnp.arange(edge_chunk, dtype=jnp.int32) < e_cnt[c]
        local = jnp.where(valid, rows - lo, span)
        # ONE one-hot band shared by every matmul, in bf16: the [E, span+1]
        # operand reads dominate all five contractions, and 0/1 entries are
        # exact in any dtype.  The logits already carry bf16-rounded er
        # (zer is a bf16 table), so bf16 el/p matmuls add no new precision
        # class; accumulation stays f32 via preferred_element_type.
        ohb = (
            local[:, None] == jnp.arange(span + 1, dtype=jnp.int32)[None, :]
        ).astype(zer.dtype)
        zer_e = zer[src]  # the ONE random gather of this chunk
        z_e, er_e = zer_e[:, :HD], zer_e[:, HD:]
        el_c = jax.lax.dynamic_slice(el, (lo, 0), (span + 1, H))
        el_e = jax.lax.dot_general(
            ohb, el_c.astype(ohb.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [E, H]
        score = jax.nn.leaky_relu(
            el_e + er_e.astype(jnp.float32), negative_slope
        )
        score = jnp.where(valid[:, None], score, neg)
        cm = jnp.max(score, axis=0)  # [H] per-head chunk max — one cheap reduce
        p = jnp.where(valid[:, None], jnp.exp(score - cm[None, :]), 0.0)
        p_sum = jax.lax.dot_general(
            ohb, p.astype(ohb.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [span+1, H]
        lse_part = jnp.where(
            p_sum > 0, cm[None, :] + jnp.log(p_sum), neg
        )
        cur_lse = jax.lax.dynamic_slice(lse, (lo, 0), (span + 1, H))
        cur_a = jax.lax.dynamic_slice(acc, (lo, 0), (span + 1, HD))
        lse_new = jnp.logaddexp(cur_lse, lse_part)
        # per-row factors: old-mass rescale, and the map from p (shifted
        # by cm) to true weights exp(score - lse_new)
        scale_old = jnp.exp(cur_lse - lse_new)  # untouched rows: exp(0)=1
        # rows with zero in-chunk mass would give exp(cm + 1e30) = inf and
        # 0*inf = NaN through the one-hot matmul — zero them (their edges
        # all have p = 0 anyway).  p_sum > 0 bounds row_f <= 1/p_sum.
        row_f = jnp.where(
            p_sum > 0, jnp.exp(cm[None, :] - lse_new), 0.0
        )  # [span+1, H]
        f_e = jax.lax.dot_general(  # row_f[local], one-hot form
            ohb, row_f.astype(ohb.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = p * f_e  # exp(score - lse_new)
        # weighted message accumulate: w broadcast over each head's
        # d-block via the expander matmul, then one-hot MXU segment-sum
        w_exp = jax.lax.dot_general(
            w.astype(z_e.dtype), expander.astype(z_e.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=z_e.dtype,
        )
        msg = w_exp * z_e
        part = jax.lax.dot_general(
            ohb, msg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [span+1, HD]
        scale_exp = jax.lax.dot_general(
            scale_old, expander.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a_new = cur_a * scale_exp + part
        lse = jax.lax.dynamic_update_slice(lse, lse_new, (lo, 0))
        acc = jax.lax.dynamic_update_slice(acc, a_new, (lo, 0))
        return lse, acc

    l0 = jnp.full((n_out + span + 1, H), neg, jnp.float32)
    a0 = jnp.zeros((n_out + span + 1, HD), jnp.float32)
    lse, acc = jax.lax.fori_loop(0, n_chunks, body, (l0, a0))
    return acc[:n_out], lse[:n_out]


def full_graph_inference(
    model,
    params,
    hg: HostGraph,
    features: jnp.ndarray,
    node_chunk: int = 256,
    edge_chunk: int = 1 << 13,
) -> jnp.ndarray:
    """Layer-wise full-neighborhood forward; returns final-layer output [N, C].

    Supports all three model families: SAGE (mean), GAT (online-softmax
    attention), GCN (symmetric-normalised with true full-graph degrees).

    Round-4 engine: ONE jitted edge-walk per layer — a fori over a static
    span-bounded chunk plan (<= ``edge_chunk`` edges and <= ``node_chunk``
    destination rows per chunk, precomputed host-side with the edge→row
    map), each chunk folding a small sorted segment-sum partial into the
    accumulator via a dynamic slice.  Replaces the round-3 host loop over
    62 destination chunks × 3 layers whose per-chunk dispatches dominated
    (~10.7M edges/s served), and avoids the full-[N] scatter-add whose
    HBM-sized output measured ~4 ms/chunk.

    Round-5: GAT runs in ONE online-softmax walk (``_gat_online_all_edges``)
    instead of two passes, all engines share a bf16 one-hot band, and the
    default chunk plan narrowed to (256 rows, 8192 edges) — the one-hot
    operand traffic scales with ``span`` while the row-gather floor is
    chunking-invariant.  Measured (probe_inf11, v5e, 500k/30M bench graph):
    SAGE 73.5 -> 79.0M, GAT 35.1 -> 56.1M edges/s; (512, 16k) and
    (128, 4k) are both worse for both models.
    """
    N = hg.num_nodes
    nnz = int(hg.num_edges)
    span = node_chunk
    h = features
    if nnz + edge_chunk >= 2**31:
        # the one-program engine carries edge offsets (edge->row map,
        # span-chunk bases) as int32; past 2.1B edges those silently wrap
        # (ADVICE r4).  The host-resident engine below has no such limit.
        raise NotImplementedError(
            f"full_graph_inference: nnz={nnz} exceeds the int32 edge-offset "
            "range; use full_graph_inference_host for >2.1B-edge graphs"
        )

    # Graph-static prep (edge uploads + edge->row map + span-chunk plan)
    # is SERVING STATE: ~3 s on the tunneled backend (120 MB H2D + a host
    # planning loop), reused across calls like the executables are.  Keyed
    # by the arrays' identity; a different graph object re-preps.
    key = (id(hg.indptr), id(hg.indices), edge_chunk, span)
    cache = _PREP_CACHE.get(id(hg))
    if cache is not None and cache[0] == key:
        indptr, indices_p, erows_p, eb, ec, rl = cache[1]
    else:
        # int32 is always sufficient here: the >=2**31-nnz case raised
        # NotImplementedError above (this engine's edge offsets are int32
        # end-to-end; the host engine owns the int64 regime)
        indptr = jnp.asarray(np.asarray(hg.indptr, dtype=np.int32))
        indices = jnp.asarray(hg.indices)
        erows = _edge_rows(indptr, N, nnz)
        indices_p = _pad_edges(indices, edge_chunk, 0)
        erows_p = _pad_edges(erows, edge_chunk, -1)
        eb, ec, rl = _span_chunks(np.asarray(hg.indptr), edge_chunk, span)
        eb, ec, rl = jnp.asarray(eb), jnp.asarray(ec), jnp.asarray(rl)
        # the host arrays ride along so their id()s cannot be recycled by
        # the allocator while this entry lives (id-keyed caches are only
        # safe if the keyed objects are kept alive)
        _PREP_CACHE[id(hg)] = (
            key, (indptr, indices_p, erows_p, eb, ec, rl),
            (hg.indptr, hg.indices),
        )
        if len(_PREP_CACHE) > 4:  # bound device memory held by old preps
            _PREP_CACHE.pop(next(iter(_PREP_CACHE)))

    is_gat = hasattr(model, "_project")
    is_gcn = (not is_gat) and not hasattr(model, "_layer_forward")
    deg_all = (indptr[1:] - indptr[:-1]).astype(jnp.float32)
    if is_gcn:
        # true full-graph degrees (the sampled-block trainer uses valid slot
        # counts; layer-wise inference uses the exact propagation rule)
        inv_sqrt = (1.0 / jnp.sqrt(deg_all + 1)).astype(h.dtype)
    for l in range(len(model.dims)):
        p = params[f"layer{l}"]
        if is_gat:
            d_out, last = model.dims[l][1], model.dims[l][2]
            H = model.num_heads
            z, el, er = model._project(p, h, d_out)  # z FLAT [N, H*d]
            # one combined source table so the walk pays ONE row gather
            zer = jnp.concatenate([z, er.astype(z.dtype)], axis=1)
            acc, _lse = _gat_online_all_edges(
                indices_p, erows_p, eb, ec, rl, zer, el, edge_chunk, span, N,
                float(model.negative_slope),
            )
            # weights already sum to 1 per row (lse shift) — no division
            agg = acc.reshape(N, H, d_out).astype(z.dtype)
            h = model._combine(p, agg, d_out, last)
        elif is_gcn:
            ssum = _sum_all_edges(
                indices_p, erows_p, eb, ec, rl, h, inv_sqrt, edge_chunk, span, N
            )
            agg = ssum.astype(h.dtype) * inv_sqrt[:, None] + h / (
                deg_all.astype(h.dtype) + 1
            )[:, None]
            h = (
                jnp.dot(agg, p["w"].astype(agg.dtype),
                        preferred_element_type=jnp.float32)
                + p["b"]
            ).astype(agg.dtype)
        else:
            ssum = _sum_all_edges(
                indices_p, erows_p, eb, ec, rl, h, None, edge_chunk, span, N
            )
            h_mean = (ssum / jnp.maximum(deg_all, 1)[:, None]).astype(h.dtype)
            h = model._layer_forward(p, h, h_mean)
        if not is_gat and l != len(model.dims) - 1:
            h = jax.nn.relu(h)
    return h
