"""Distributed full-graph layer-wise inference over the mesh.

The single-chip ``models/inference.full_graph_inference`` needs the whole
[N, F] activation table in one HBM; at the north-star scale (papers100M:
111M nodes x 256 f32 ≈ 114 GB of activations per layer) it only fits
SHARDED.  This module runs the same layer-wise full-neighborhood protocol
with ``h`` node-range-sharded over the mesh and a **ring rotation**
(``lax.ppermute``) of activation blocks:

    for t in 0..D-1:                      # D = mesh size
        every device aggregates the edges whose src lies in the block it
        currently holds, then passes the block one step around the ring

so cross-chip traffic is D-1 *contiguous* block transfers per layer riding
ICI at full bandwidth — no random remote reads, no request budgets, no
overflow accounting.  Per-device work stays static-shaped: the host prep
sorts each device's in-edges by the owner shard of their src and pads each
(device, owner) bucket to the global max.

The reference has no multi-device inference (its ``SAGE.inference`` runs
layer-wise on ONE GPU reading features over UVA,
``example/graphsage/utils/models.py:57-97``); this is the TPU-native
analog that scales the same protocol past one chip.

Supports all three model families: SAGE (mean), GCN (true-degree
symmetric normalisation), and GAT — whose softmax over each row's full
in-neighborhood is computed *across rotations* with the same online
(flash-style) renormalisation the single-chip engines use across edge
chunks (``models/inference._gat_online_all_edges`` / ``_gat_acc_slab``).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dist_gnn_tpu.graph import HostGraph

_AX = "ring"


def build_ring_layout(hg: HostGraph, D: int, edge_chunk: int):
    """Host-side prep: per device, its dst span's in-edges sorted by the
    owner shard of src, padded per (device, owner) bucket to the global max
    (rounded up to ``edge_chunk``).

    Returns (S, E_pad, src_local [D,D,E], dst_row [D,D,E], valid [D,D,E],
    deg [D*S]) — src_local is the src id *within its owner's block*.

    Padding note: bucket sizes are max-padded, so a heavily skewed
    owner distribution inflates E_pad; node-range sharding of a
    shuffled-id graph (the preprocess layout) keeps buckets balanced.
    """
    indptr = np.asarray(hg.indptr)
    indices = np.asarray(hg.indices)
    N = hg.num_nodes
    S = (N + D - 1) // D

    per_dev = []
    e_max = 0
    for d in range(D):
        lo_n, hi_n = d * S, min((d + 1) * S, N)
        lo_e, hi_e = int(indptr[lo_n]), int(indptr[hi_n])
        src = indices[lo_e:hi_e].astype(np.int64)
        deg_span = (indptr[lo_n + 1 : hi_n + 1] - indptr[lo_n:hi_n]).astype(
            np.int64
        )
        dst_row = np.repeat(np.arange(hi_n - lo_n, dtype=np.int32), deg_span)
        owner = src // S
        order = np.argsort(owner, kind="stable")
        src, dst_row, owner = src[order], dst_row[order], owner[order]
        counts = np.bincount(owner, minlength=D)
        e_max = max(e_max, int(counts.max(initial=0)))
        per_dev.append((src, dst_row, counts))

    E = max(edge_chunk, ((e_max + edge_chunk - 1) // edge_chunk) * edge_chunk)
    src_local = np.zeros((D, D, E), np.int32)
    dst_rows = np.zeros((D, D, E), np.int32)
    valid = np.zeros((D, D, E), bool)
    for d, (src, dst_row, counts) in enumerate(per_dev):
        offs = np.concatenate([[0], np.cumsum(counts)])
        for o in range(D):
            c = int(counts[o])
            sl = slice(int(offs[o]), int(offs[o]) + c)
            src_local[d, o, :c] = (src[sl] - o * S).astype(np.int32)
            dst_rows[d, o, :c] = dst_row[sl]
            valid[d, o, :c] = True

    deg = np.zeros((D * S,), np.float32)
    deg[:N] = (indptr[1:] - indptr[:-1]).astype(np.float32)
    return S, E, src_local, dst_rows, valid, deg


def _ring_aggregate(h, wsrc, srcl, dstr, valid, *, D, edge_chunk):
    """Weighted in-neighbor sum for this device's dst rows, rotating the
    [S, F] activation block (and its [S] src-weight block) around the ring.

    h/wsrc: this device's block; srcl/dstr/valid: [1, D, E_pad] per-owner
    edge buckets (leading axis is the sharded device dim). Call inside
    shard_map over the flat ring axis."""
    S, F = h.shape
    srcl, dstr, valid = srcl[0], dstr[0], valid[0]
    E = srcl.shape[1]
    me = jax.lax.axis_index(_AX)
    perm = [(i, (i - 1) % D) for i in range(D)]
    n_chunks = E // edge_chunk

    def rot(t, carry):
        acc, v, wv = carry
        o = (me + t) % D  # owner of the block this device holds at step t
        sl = jnp.take(srcl, o, axis=0)
        dr = jnp.take(dstr, o, axis=0)
        vd = jnp.take(valid, o, axis=0)

        def chunk(c, a):
            i0 = c * edge_chunk
            sl_c = jax.lax.dynamic_slice(sl, (i0,), (edge_chunk,))
            dr_c = jax.lax.dynamic_slice(dr, (i0,), (edge_chunk,))
            vd_c = jax.lax.dynamic_slice(vd, (i0,), (edge_chunk,))
            msg = jnp.where(
                vd_c[:, None], v[sl_c] * wv[sl_c][:, None].astype(v.dtype), 0
            )
            return a + jax.ops.segment_sum(msg, dr_c, num_segments=S)

        acc = jax.lax.fori_loop(0, n_chunks, chunk, acc)
        v = jax.lax.ppermute(v, _AX, perm)
        wv = jax.lax.ppermute(wv, _AX, perm)
        return acc, v, wv

    # mark the fresh accumulator as device-varying over the ring axis so the
    # fori carry type matches the (varying) per-device partial sums
    acc0 = jax.lax.pcast(jnp.zeros((S, F), h.dtype), (_AX,), to="varying")
    acc, _, _ = jax.lax.fori_loop(0, D, rot, (acc0, h, wsrc))
    return acc


def _ring_gat_aggregate(
    z, el, er, srcl, dstr, valid, *, D, edge_chunk, negative_slope
):
    """GAT attention aggregation with the softmax normalised over each dst
    row's FULL in-neighborhood, accumulated across ring rotations AND edge
    chunks with online (flash-style) renormalisation — the distributed
    sibling of ``models/inference._gat_online_all_edges``.

    z [S, H, d] / el, er [S, H] are this device's projected block; the
    (z, er) pair rotates around the ring.  Returns [S, H, d]."""
    S, H, d = z.shape
    srcl, dstr, valid = srcl[0], dstr[0], valid[0]
    E = srcl.shape[1]
    me = jax.lax.axis_index(_AX)
    perm = [(i, (i - 1) % D) for i in range(D)]
    n_chunks = E // edge_chunk
    neg = jnp.float32(-1e30)

    def rot(t, carry):
        m, s, acc, zv, erv = carry
        o = (me + t) % D
        sl = jnp.take(srcl, o, axis=0)
        dr = jnp.take(dstr, o, axis=0)
        vd = jnp.take(valid, o, axis=0)

        def chunk(c, mc):
            m, s, acc = mc
            i0 = c * edge_chunk
            sl_c = jax.lax.dynamic_slice(sl, (i0,), (edge_chunk,))
            dr_c = jax.lax.dynamic_slice(dr, (i0,), (edge_chunk,))
            vd_c = jax.lax.dynamic_slice(vd, (i0,), (edge_chunk,))
            score = jax.nn.leaky_relu(
                (el[dr_c] + erv[sl_c]).astype(jnp.float32), negative_slope
            )
            score = jnp.where(vd_c[:, None], score, neg)
            m_c = jax.ops.segment_max(score, dr_c, num_segments=S)
            m_new = jnp.maximum(m, m_c)
            scale = jnp.exp(m - m_new)
            w = jnp.where(vd_c[:, None], jnp.exp(score - m_new[dr_c]), 0.0)
            s = s * scale + jax.ops.segment_sum(w, dr_c, num_segments=S)
            contrib = jax.ops.segment_sum(
                w[:, :, None] * zv[sl_c].astype(jnp.float32),
                dr_c,
                num_segments=S,
            )
            acc = acc * scale[..., None] + contrib
            return m_new, s, acc

        m, s, acc = jax.lax.fori_loop(0, n_chunks, chunk, (m, s, acc))
        zv = jax.lax.ppermute(zv, _AX, perm)
        erv = jax.lax.ppermute(erv, _AX, perm)
        return m, s, acc, zv, erv

    varying = lambda x: jax.lax.pcast(x, (_AX,), to="varying")
    m0 = varying(jnp.full((S, H), neg, jnp.float32))
    s0 = varying(jnp.zeros((S, H), jnp.float32))
    a0 = varying(jnp.zeros((S, H, d), jnp.float32))
    _, s, acc, _, _ = jax.lax.fori_loop(0, D, rot, (m0, s0, a0, z, er))
    out = acc / jnp.maximum(s, 1e-12)[..., None]
    return out.astype(z.dtype)


def dist_full_graph_inference(
    model,
    params,
    hg: HostGraph,
    features,
    mesh: Mesh | None = None,
    edge_chunk: int = 4096,
) -> np.ndarray:
    """Layer-wise full-neighborhood forward with node-range-sharded
    activations; returns host [N, C] logits.

    ``mesh`` may be any mesh (its devices are re-flattened into a 1-D ring
    — inference is an offline pass and does not need to compose with the
    trainer's axes); defaults to all devices.
    """
    devices = (
        mesh.devices.reshape(-1) if mesh is not None else np.asarray(jax.devices())
    )
    D = len(devices)
    ring = Mesh(devices, (_AX,))
    S, E, srcl, dstr, valid, deg = build_ring_layout(hg, D, edge_chunk)
    N = hg.num_nodes

    feats = np.zeros((D * S, features.shape[1]), np.asarray(features).dtype)
    feats[:N] = np.asarray(features)
    shard_rows = NamedSharding(ring, P(_AX, None))
    shard_vec = NamedSharding(ring, P(_AX))
    shard_bkt = NamedSharding(ring, P(_AX, None, None))
    h = jax.device_put(feats, shard_rows)
    deg_d = jax.device_put(deg, shard_vec)
    srcl_d = jax.device_put(srcl, shard_bkt)
    dstr_d = jax.device_put(dstr, shard_bkt)
    valid_d = jax.device_put(valid, shard_bkt)

    is_gat = hasattr(model, "_project")
    is_gcn = (not is_gat) and not hasattr(model, "_layer_forward")
    if is_gcn:
        inv_sqrt = (1.0 / np.sqrt(deg + 1)).astype(np.float32)
        wsrc_d = jax.device_put(inv_sqrt, shard_vec)
    else:
        wsrc_d = jax.device_put(np.ones_like(deg), shard_vec)

    @partial(jax.jit, static_argnames=("l", "last"))
    def layer(h, wsrc, deg_blk, srcl, dstr, valid, p, *, l: int, last: bool):
        def body(h_blk, wsrc_blk, deg_b, sl, dr, vd, p):
            if is_gat:
                d_out = model.dims[l][1]
                z, el, er = model._project(p, h_blk, d_out)
                z = z.reshape(z.shape[0], model.num_heads, d_out)
                agg = _ring_gat_aggregate(
                    z, el, er, sl, dr, vd, D=D, edge_chunk=edge_chunk,
                    negative_slope=model.negative_slope,
                )
                return model._combine(p, agg, d_out, last)
            agg = _ring_aggregate(
                h_blk, wsrc_blk, sl, dr, vd, D=D, edge_chunk=edge_chunk
            )
            if is_gcn:
                agg = (
                    agg * wsrc_blk[:, None].astype(agg.dtype)
                    + h_blk / (deg_b + 1)[:, None].astype(h_blk.dtype)
                )
                out = (
                    jnp.dot(
                        agg,
                        p["w"].astype(agg.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + p["b"]
                ).astype(agg.dtype)
            else:
                h_mean = agg / jnp.maximum(deg_b, 1)[:, None].astype(agg.dtype)
                out = model._layer_forward(p, h_blk, h_mean)
            if not last:
                out = jax.nn.relu(out)
            return out

        return jax.shard_map(
            body,
            mesh=ring,
            in_specs=(
                P(_AX, None), P(_AX), P(_AX),
                P(_AX, None, None), P(_AX, None, None), P(_AX, None, None),
                P(),
            ),
            out_specs=P(_AX, None),
        )(h, wsrc, deg_blk, srcl, dstr, valid, p)

    L = len(model.dims)
    for l in range(L):
        h = layer(
            h, wsrc_d, deg_d, srcl_d, dstr_d, valid_d, params[f"layer{l}"],
            l=l, last=(l == L - 1),
        )
    return np.asarray(h)[:N]
