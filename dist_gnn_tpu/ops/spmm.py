"""Block aggregation ops ("SpMM" over sampled blocks).

In the reference, neighborhood aggregation is delegated to DGL's SAGEConv
SpMM over nnz-sized COO blocks (SURVEY.md §2 Models).  In the TPU design a
block is a dense padded ``[S, k]`` slot table into the frontier feature
matrix, so aggregation = gather + masked reduction — a shape XLA fuses well;
the Pallas fused gather-aggregate kernel (ops/gather_pallas.py) removes the
[S, k, F] materialisation for large F.

These jnp versions are the reference implementations and the CPU/test path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_grouped(table: jnp.ndarray, group: int) -> jnp.ndarray:
    """Pack G consecutive node rows per physical row: [N, F] → [N/G, G*F].

    NOTE — measured a net LOSS for feature gathers on v5e (540k bf16 rows:
    plain 6.2 ms, G=2 8.9 ms, G=8 18.2 ms): row gathers at this size are
    already partially byte-bound, so G× byte amplification outweighs the
    slice-count saving.  Kept as a utility (useful when rows are very
    short, e.g. few-column label tables); pair with :func:`grouped_gather`.
    """
    N, F = table.shape
    pad = (-N) % group
    if pad:
        table = jnp.concatenate([table, jnp.zeros((pad, F), table.dtype)])
    return table.reshape((N + pad) // group, group * F)


def grouped_gather(
    packed: jnp.ndarray,  # [N/G, G*F] from pack_grouped
    ids: jnp.ndarray,  # [L] node ids
    group: int,
    feature_dim: int,
) -> jnp.ndarray:
    """``table[ids]`` against a grouped-packed table: [L, F]."""
    rows = packed[ids // group]  # [L, G*F]
    sub = (ids % group).astype(jnp.int32)
    rows = rows.reshape(rows.shape[0], group, feature_dim)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, group, 1), 1)
    sel = g_iota == sub[:, None, None]
    return jnp.sum(jnp.where(sel, rows, 0), axis=1)


def gather_mean(
    h_src: jnp.ndarray,  # [cap_src, F]
    slots: jnp.ndarray,  # [S, k] int32 positions into h_src
    mask: jnp.ndarray,  # [S, k] bool
) -> jnp.ndarray:
    """Masked mean of neighbor features per destination row: [S, F].

    Zero-neighbor rows produce zeros (DGL SAGEConv 'mean' semantics on an
    empty neighborhood).
    """
    g = h_src[slots]  # [S, k, F]
    m = mask[..., None].astype(h_src.dtype)
    s = jnp.sum(g * m, axis=1)
    cnt = jnp.sum(mask, axis=1, dtype=h_src.dtype)[:, None]
    return s / jnp.maximum(cnt, 1)


def masked_segment_softmax(
    scores: jnp.ndarray,  # [S, k] or [S, k, H]
    mask: jnp.ndarray,  # [S, k]
) -> jnp.ndarray:
    """Softmax over each row's valid neighbor slots (edge-softmax analog)."""
    if scores.ndim == 3:
        m = mask[..., None]
    else:
        m = mask
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(m, scores, neg)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s) * m.astype(scores.dtype)
    denom = jnp.sum(e, axis=1, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(scores.dtype).tiny)
