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
    rel = (local_ptr - base).astype(jnp.int32)  # OOB/negative -> dropped
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


def full_graph_inference(
    model,
    params,
    hg: HostGraph,
    features: jnp.ndarray,
    node_chunk: int = 8192,
    edge_chunk: int = 1 << 15,
) -> jnp.ndarray:
    """Layer-wise full-neighborhood forward; returns final-layer output [N, C].

    Supports all three model families: SAGE (mean), GAT (online-softmax
    attention), GCN (symmetric-normalised with true full-graph degrees).

    Host loop over layers × dst chunks; each chunk call is one jit with
    static shapes (the edge-span length is a traced fori bound, so chunk
    calls share one executable per node-chunk size).
    """
    ptr_dtype = np.int64 if hg.num_edges >= 2**31 else np.int32
    indptr = jnp.asarray(np.asarray(hg.indptr, dtype=ptr_dtype))
    indices = jnp.asarray(hg.indices)
    N = hg.num_nodes
    indptr_np = np.asarray(hg.indptr)
    h = features

    is_gat = hasattr(model, "_project")
    is_gcn = (not is_gat) and not hasattr(model, "_layer_forward")
    if is_gcn:
        # true full-graph degrees (the sampled-block trainer uses valid slot
        # counts; layer-wise inference uses the exact propagation rule)
        deg_all = (indptr[1:] - indptr[:-1]).astype(h.dtype)
        inv_sqrt = 1.0 / jnp.sqrt(deg_all + 1)
    for l in range(len(model.dims)):
        p = params[f"layer{l}"]
        if is_gat:
            d_out, last = model.dims[l][1], model.dims[l][2]
            z, el, er = model._project(p, h, d_out)
            # _project returns FLAT z [N, H*d]; the span aggregator wants
            # the per-head view
            z = z.reshape(z.shape[0], model.num_heads, d_out)
        outs = []
        for lo in range(0, N, node_chunk):
            num = min(node_chunk, N - lo)
            e_lo = int(indptr_np[lo])
            e_hi = int(indptr_np[lo + num])
            if is_gat:
                agg = _gat_aggregate_span(
                    indptr, indices, z, el, er, lo, num, e_lo, e_hi,
                    edge_chunk, model.negative_slope,
                )
                out = model._combine(p, agg, d_out, last)
            elif is_gcn:
                agg = _gcn_aggregate_span(
                    indptr, indices, h, inv_sqrt, lo, num, e_lo, e_hi,
                    edge_chunk,
                )
                out = (
                    jnp.dot(agg, p["w"].astype(agg.dtype),
                            preferred_element_type=jnp.float32)
                    + p["b"]
                ).astype(agg.dtype)
            else:
                h_mean = _mean_aggregate_span(
                    indptr, indices, h, lo, num, e_lo, e_hi, edge_chunk
                )
                out = model._layer_forward(p, h[lo : lo + num], h_mean)
            outs.append(out)
        h = jnp.concatenate(outs, axis=0)
        if not is_gat and l != len(model.dims) - 1:
            h = jax.nn.relu(h)
    return h
