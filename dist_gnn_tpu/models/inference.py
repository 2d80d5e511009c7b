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


@partial(jax.jit, static_argnames=("num_dst", "edge_chunk"))
def _mean_aggregate_span(
    indptr, indices, h, dst_lo, num_dst: int, edge_lo, edge_hi, edge_chunk: int
):
    """Masked neighbor-mean for dst rows [dst_lo, dst_lo + num_dst)."""
    F = h.shape[1]
    nnz = indices.shape[0]
    local_ptr = jax.lax.dynamic_slice(indptr, (dst_lo,), (num_dst + 1,))
    deg = (local_ptr[1:] - local_ptr[:-1]).astype(h.dtype)

    def body(c, acc):
        base = edge_lo + c * edge_chunk
        off = base + jnp.arange(edge_chunk, dtype=jnp.int64 if indptr.dtype == jnp.int64 else jnp.int32)
        valid = off < edge_hi
        off_c = jnp.clip(off, 0, nnz - 1)
        src = indices[off_c]
        rows = _span_rows(local_ptr, base, edge_chunk, num_dst)
        msg = jnp.where(valid[:, None], h[jnp.where(valid, src, 0)], 0)
        return acc + jax.ops.segment_sum(
            msg, rows, num_segments=num_dst, indices_are_sorted=True
        )

    n_chunks = (edge_hi - edge_lo + edge_chunk - 1) // edge_chunk
    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((num_dst, F), h.dtype))
    return acc / jnp.maximum(deg, 1)[:, None]


@partial(jax.jit, static_argnames=("num_dst", "edge_chunk"))
def _gcn_aggregate_span(
    indptr, indices, h, inv_sqrt, dst_lo, num_dst: int, edge_lo, edge_hi,
    edge_chunk: int,
):
    """Symmetric-normalised GCN aggregation for dst rows
    [dst_lo, dst_lo + num_dst) with TRUE full-graph degrees:

        agg_i = 1/sqrt(deg_i+1) * sum_j h_j / sqrt(deg_j+1)  +  h_i/(deg_i+1)

    ``inv_sqrt`` is the precomputed [N] vector 1/sqrt(deg+1)."""
    F = h.shape[1]
    nnz = indices.shape[0]
    local_ptr = jax.lax.dynamic_slice(indptr, (dst_lo,), (num_dst + 1,))
    deg = (local_ptr[1:] - local_ptr[:-1]).astype(h.dtype)
    inv_dst = jax.lax.dynamic_slice(inv_sqrt, (dst_lo,), (num_dst,))

    def body(c, acc):
        base = edge_lo + c * edge_chunk
        off = base + jnp.arange(edge_chunk, dtype=local_ptr.dtype)
        valid = off < edge_hi
        off_c = jnp.clip(off, 0, nnz - 1)
        src = jnp.where(valid, indices[off_c], 0)
        rows = _span_rows(local_ptr, base, edge_chunk, num_dst)
        msg = jnp.where(valid[:, None], h[src] * inv_sqrt[src][:, None], 0)
        return acc + jax.ops.segment_sum(
            msg, rows, num_segments=num_dst, indices_are_sorted=True
        )

    n_chunks = (edge_hi - edge_lo + edge_chunk - 1) // edge_chunk
    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((num_dst, F), h.dtype))
    h_dst = jax.lax.dynamic_slice(h, (dst_lo, 0), (num_dst, F))
    return acc * inv_dst[:, None].astype(h.dtype) + h_dst / (deg + 1)[:, None]


@partial(jax.jit, static_argnames=("num_dst", "edge_chunk", "negative_slope"))
def _gat_aggregate_span(
    indptr, indices, z, el, er, dst_lo, num_dst: int, edge_lo, edge_hi,
    edge_chunk: int, negative_slope: float,
):
    """Attention aggregation for dst rows [dst_lo, dst_lo+num_dst): softmax
    over each row's FULL in-neighborhood, streamed over edge chunks with an
    online (flash-style) renormalisation so no [deg]-sized state exists.

    z [N, H, d] projected features, el/er [N, H] SDDMM halves.
    Returns [num_dst, H, d]."""
    N, H, d = z.shape
    nnz = indices.shape[0]
    local_ptr = jax.lax.dynamic_slice(indptr, (dst_lo,), (num_dst + 1,))
    el_dst = jax.lax.dynamic_slice(el, (dst_lo, 0), (num_dst, H))
    neg = jnp.float32(-1e30)

    def body(c, carry):
        m, s, acc = carry  # [num,H], [num,H], [num,H,d]
        base = edge_lo + c * edge_chunk
        off = base + jnp.arange(edge_chunk, dtype=local_ptr.dtype)
        valid = off < edge_hi
        off_c = jnp.clip(off, 0, nnz - 1)
        src = jnp.where(valid, indices[off_c], 0)
        rows = _span_rows(local_ptr, base, edge_chunk, num_dst)
        score = jax.nn.leaky_relu(
            (el_dst[rows] + er[src]).astype(jnp.float32), negative_slope
        )  # [E, H]
        score = jnp.where(valid[:, None], score, neg)
        m_c = jax.ops.segment_max(score, rows, num_segments=num_dst)
        m_new = jnp.maximum(m, m_c)
        # rescale old accumulators; exp(neg - neg) -> exp(0)=1 is harmless
        # because s/acc are 0 whenever m is still neg
        scale = jnp.exp(m - m_new)
        w = jnp.where(valid[:, None], jnp.exp(score - m_new[rows]), 0.0)
        s = s * scale + jax.ops.segment_sum(w, rows, num_segments=num_dst)
        contrib = jax.ops.segment_sum(
            w[:, :, None] * z[src].astype(jnp.float32),
            rows,
            num_segments=num_dst,
        )
        acc = acc * scale[..., None] + contrib
        return m_new, s, acc

    n_chunks = (edge_hi - edge_lo + edge_chunk - 1) // edge_chunk
    m0 = jnp.full((num_dst, H), neg, jnp.float32)
    s0 = jnp.zeros((num_dst, H), jnp.float32)
    a0 = jnp.zeros((num_dst, H, d), jnp.float32)
    _, s, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, s0, a0))
    out = acc / jnp.maximum(s, 1e-12)[..., None]
    return out.astype(z.dtype)


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
    (flash-style renormalisation, same math as :func:`_gat_aggregate_span`
    but with host-staged z/er instead of device-resident [N, ...] state)."""
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
    graph instead of per chunk).  Padding slots (>= nnz) get row
    ``num_nodes`` — an overflow segment the aggregators drop."""
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
def _gat_ms_all_edges(
    indices_p, erows_p, e_base, e_cnt, row_lo, el, er,
    edge_chunk: int, span: int, n_out: int, negative_slope: float,
):
    """GAT pass 1: final per-row softmax max ``m`` and denominator ``s``
    over all edges, online (flash-style) per span-chunk — the rescale
    touches only the chunk's [span+1, H] slice, never the full state."""
    H = el.shape[1]
    n_chunks = e_base.shape[0]
    neg = jnp.float32(-1e30)
    # pad el so the per-chunk [span+1] slice never clamps near row N
    el = jnp.concatenate([el, jnp.zeros((span + 1, H), el.dtype)], axis=0)

    def body(c, carry):
        m, s = carry
        base = e_base[c]
        lo = row_lo[c]
        src = jax.lax.dynamic_slice(indices_p, (base,), (edge_chunk,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (edge_chunk,))
        valid = jnp.arange(edge_chunk, dtype=jnp.int32) < e_cnt[c]
        local = jnp.where(valid, rows - lo, span)
        # el by chunk-local one-hot matmul (the global el[rows] gather cost
        # ~0.16 ms/chunk; the banded [E, span+1] contraction is MXU work)
        oh_b = local[:, None] == jnp.arange(span + 1, dtype=jnp.int32)[None, :]
        oh = oh_b.astype(jnp.float32)
        el_c = jax.lax.dynamic_slice(el, (lo, 0), (span + 1, H))
        el_e = jax.lax.dot_general(
            oh, el_c.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [E, H]
        score = jax.nn.leaky_relu(
            el_e + er[src].astype(jnp.float32), negative_slope
        )
        score = jnp.where(valid[:, None], score, neg)
        # per-row max WITHOUT segment_max's scatter (~2.5 ms/chunk on TPU):
        # masked reduce over the edge axis per head — XLA fuses the select
        # into the reduction, no [E, span, H] intermediate
        part_m = jnp.stack(
            [
                jnp.max(
                    jnp.where(oh_b, score[:, h : h + 1], neg), axis=0
                )
                for h in range(H)
            ],
            axis=1,
        )  # [span+1, H]
        cur_m = jax.lax.dynamic_slice(m, (lo, 0), (span + 1, H))
        cur_s = jax.lax.dynamic_slice(s, (lo, 0), (span + 1, H))
        m_new = jnp.maximum(cur_m, part_m)
        m_e = jax.lax.dot_general(  # m_new[local], one-hot form
            oh, m_new, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = jnp.where(valid[:, None], jnp.exp(score - m_e), 0.0)
        w_sum = jax.lax.dot_general(
            oh, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_new = cur_s * jnp.exp(cur_m - m_new) + w_sum
        m = jax.lax.dynamic_update_slice(m, m_new, (lo, 0))
        s = jax.lax.dynamic_update_slice(s, s_new, (lo, 0))
        return m, s

    m0 = jnp.full((n_out + span + 1, H), neg, jnp.float32)
    s0 = jnp.zeros((n_out + span + 1, H), jnp.float32)
    m, s = jax.lax.fori_loop(0, n_chunks, body, (m0, s0))
    return m[:n_out], s[:n_out]


@partial(jax.jit, static_argnames=("edge_chunk", "span", "n_out", "negative_slope"))
def _gat_acc_all_edges(
    indices_p, erows_p, e_base, e_cnt, row_lo, z, el, er, m, rs,
    edge_chunk: int, span: int, n_out: int, negative_slope: float,
):
    """GAT pass 2: with the FINAL m and reciprocal denominator ``rs``,
    accumulate ``sum alpha * z_src`` — one segment-sum + slice fold per
    span chunk (the accumulator is never rescaled).  ``z`` arrives FLAT
    [N, H*d] so the per-chunk gather/multiply stay 2-D (3-D forms forced
    Mosaic relayouts, measured 2.2 ms/chunk)."""
    N, HD = z.shape
    H = el.shape[1]
    d = HD // H
    n_chunks = e_base.shape[0]
    # pad per-row tables so per-chunk slices never clamp near row N
    pad = lambda a: jnp.concatenate(
        [a, jnp.zeros((span + 1, a.shape[1]), a.dtype)], axis=0
    )
    el, m, rs = pad(el), pad(m), pad(rs)

    def body(c, acc):
        base = e_base[c]
        lo = row_lo[c]
        src = jax.lax.dynamic_slice(indices_p, (base,), (edge_chunk,))
        rows = jax.lax.dynamic_slice(erows_p, (base,), (edge_chunk,))
        valid = jnp.arange(edge_chunk, dtype=jnp.int32) < e_cnt[c]
        local = jnp.where(valid, rows - lo, span)
        oh_b = local[:, None] == jnp.arange(span + 1, dtype=jnp.int32)[None, :]
        # per-row tables (el, final m, 1/s) land on edges via the one-hot
        # matmul over the chunk-local slice — no global row gathers
        tbl = jnp.concatenate(
            [
                jax.lax.dynamic_slice(el, (lo, 0), (span + 1, H)).astype(jnp.float32),
                jax.lax.dynamic_slice(m, (lo, 0), (span + 1, H)),
                jax.lax.dynamic_slice(rs, (lo, 0), (span + 1, H)),
            ],
            axis=1,
        )
        onto = jax.lax.dot_general(
            oh_b.astype(jnp.float32), tbl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [E, 3H]
        el_e, m_e, rs_e = onto[:, :H], onto[:, H : 2 * H], onto[:, 2 * H :]
        score = jax.nn.leaky_relu(
            el_e + er[src].astype(jnp.float32), negative_slope
        )
        alpha = jnp.where(valid[:, None], jnp.exp(score - m_e) * rs_e, 0.0)
        # broadcast alpha over each head's d-block via a one-hot expander
        # matmul — the [E, H, d] reshape+broadcast form forces Mosaic
        # relayouts (measured: pass-2 2.2 ms/chunk dominated GAT serving)
        expander = (
            jax.lax.broadcasted_iota(jnp.int32, (H, H * d), 1) // d
            == jax.lax.broadcasted_iota(jnp.int32, (H, H * d), 0)
        ).astype(z.dtype)
        alpha_exp = jax.lax.dot_general(
            alpha.astype(z.dtype), expander, (((1,), (0,)), ((), ())),
            preferred_element_type=z.dtype,
        )
        msg = alpha_exp * z[src]
        # one-hot MXU segment-sum (see _sum_all_edges)
        part = jax.lax.dot_general(
            oh_b.astype(msg.dtype), msg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cur = jax.lax.dynamic_slice(acc, (lo, 0), (span + 1, H * d))
        return jax.lax.dynamic_update_slice(acc, cur + part, (lo, 0))

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((n_out + span + 1, H * d), jnp.float32)
    )
    return acc[:n_out].reshape(n_out, H, d)


def full_graph_inference(
    model,
    params,
    hg: HostGraph,
    features: jnp.ndarray,
    node_chunk: int = 512,
    edge_chunk: int = 1 << 14,
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
    """
    N = hg.num_nodes
    nnz = int(hg.num_edges)
    span = node_chunk
    h = features

    # Graph-static prep (edge uploads + edge->row map + span-chunk plan)
    # is SERVING STATE: ~3 s on the tunneled backend (120 MB H2D + a host
    # planning loop), reused across calls like the executables are.  Keyed
    # by the arrays' identity; a different graph object re-preps.
    key = (id(hg.indptr), id(hg.indices), edge_chunk, span)
    cache = _PREP_CACHE.get(id(hg))
    if cache is not None and cache[0] == key:
        indptr, indices_p, erows_p, eb, ec, rl = cache[1]
    else:
        ptr_dtype = np.int64 if nnz >= 2**31 else np.int32
        indptr = jnp.asarray(np.asarray(hg.indptr, dtype=ptr_dtype))
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
            m, s = _gat_ms_all_edges(
                indices_p, erows_p, eb, ec, rl, el, er, edge_chunk, span, N,
                float(model.negative_slope),
            )
            rs = 1.0 / jnp.maximum(s, 1e-12)
            agg = _gat_acc_all_edges(
                indices_p, erows_p, eb, ec, rl, z, el, er, m, rs, edge_chunk,
                span, N, float(model.negative_slope),
            ).astype(z.dtype)
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
