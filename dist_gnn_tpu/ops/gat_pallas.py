"""Fused Pallas GAT layer: edge-softmax + aggregate + project.

The round-3 roofline study (NOTES, ``scripts/probe_gat1.py``) showed the
jnp GAT layer-0 at 4.7 ms value_and_grad vs a ~0.6 ms traffic+FLOP
roofline, and located the gap in LAYOUT: every ``[S, K, H]``-shaped
softmax/broadcast op puts H=4 on the 128-lane axis (~3% VPU utilization),
and the unfused op chain re-crosses HBM between SDDMM, softmax, and the
weighted sum.  This kernel is the designed fix:

* **k-major neighbor layout** ``x_n[K, S, E]`` — per-k slices are
  contiguous ``[S_b, E]`` VMEM tiles with E on lanes (full VPU width) and
  S_b on sublanes.  The dedup-free first hop emits this layout natively
  (``sampler._no_dedup_block``); deduped upper hops reach it through the
  k-major ``h[slots.T]`` gather shim in ``models/gat.py``.
* **SDDMM halves el/er are computed OUTSIDE the kernel** (round 5): two
  big XLA matmuls (``x_dst @ wal``, ``[K*S, E] @ war``) instead of
  1 + K tiny ``[S_b, E] x [E, H]`` MXU ops per grid step inside both the
  forward and the backward recompute — the K-unrolled score chain's
  per-op overhead was the measured gap to the forward roofline
  (NOTES round-4: fwd 0.68 vs ~0.35 ms).  The custom-VJP boundary moves
  inward accordingly: the kernel emits ``d_el``/``d_er3`` and plain
  autodiff of the outer matmuls yields the ``wal``/``war`` (and er-path
  input) gradients as two more big MXU contractions.
* scores/softmax as K-unrolled ``[S_b, H]`` adds/selects — tiny, and now
  matmul-free.
* aggregation = K*H column-broadcast FMAs, never materializing
  ``[S, K, H]`` or ``[S*K, H*D]``; per-head projection ``agg_h @ W_h`` on
  the MXU inside the same kernel.
* backward recomputes alpha from el/er3 (cheap, matmul-free) instead of
  saving any ``[S, K, *]`` residual; dW accumulates across the grid in a
  revisited f32 VMEM block; ``d_el``/``d_er3`` are per-block outputs.

Reference parity: this owns the math the reference delegates to DGL's
SpMM/SDDMM (``/root/reference/example/graphsage/utils/models.py:25-55``);
the attention formulation matches ``models/gat.py`` (folded
aggregate-then-project, exact because attention commutes with the shared
projection W).

Numerics: softmax is computed in f32 with a per-row GLOBAL max (over all
heads' valid slots) instead of a per-(row, head) max — mathematically
identical (the max cancels), overflow-safe, and one lane-reduction
instead of H.  el/er3 are f32 (the outer dots accumulate f32).  The
forward weighted sum casts alpha to the input dtype before the multiply
(matching the jnp path's precision; accumulation is f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_rows(e_dim: int) -> int:
    """Destination rows per grid step, sized to keep the double-buffered
    [K, S_b, E] neighbor slab + f32 accumulators well under VMEM."""
    if e_dim <= 128:
        return 256
    if e_dim <= 512:
        return 128
    return 64


def _score_chain(el, er_ref, mk, slope, K: int):
    """Shared fwd/bwd recompute: per-k scores -> masked softmax pieces.

    ``el`` [S_b, H] f32 and ``er_ref`` [K, S_b, H] f32 are PRECOMPUTED
    (outer matmuls) — the chain is adds/selects/exps only.  Returns
    (pre_list, alpha_list); alpha_k is [S_b, H] f32, masked slots exactly
    0.
    """
    f32 = jnp.float32
    neg = f32(-1e30)
    pre_list, s_list = [], []
    for k in range(K):
        pre = el + er_ref[k]
        s = jnp.where(pre >= 0, pre, pre * slope)
        s = jnp.where(mk[:, k : k + 1] > 0, s, neg)
        pre_list.append(pre)
        s_list.append(s)
    g = s_list[0]
    for k in range(1, K):
        g = jnp.maximum(g, s_list[k])
    # all-masked rows: g = -1e30 -> exp(0) = 1, killed by the mask factor
    e_list = []
    den = jnp.zeros_like(g)
    for k in range(K):
        e = jnp.exp(s_list[k] - g) * mk[:, k : k + 1]
        e_list.append(e)
        den = den + e
    rden = 1.0 / jnp.maximum(den, 1e-12)
    alpha_list = [e * rden for e in e_list]
    return pre_list, alpha_list


def _fwd_kernel(
    xn_ref, el_ref, er_ref, mk_ref, w_ref, out_ref,
    *, K: int, H: int, D: int, slope: float,
):
    f32 = jnp.float32
    _, alpha = _score_chain(el_ref[:], er_ref, mk_ref[:], f32(slope), K)
    # aggregation vectorised over the leading k-dim: one [K, S_b, E]
    # broadcast-multiply + leading-axis reduce per head (k on the leading
    # dim is free in the k-major layout; fewer, larger VPU ops than the
    # K-unrolled fma loop)
    x3 = xn_ref[:]  # [K, S_b, E]
    alpha3 = jnp.stack(alpha, axis=0)  # [K, S_b, H]
    w = w_ref[:]
    for h in range(H):
        agg_h = jnp.sum(
            x3 * alpha3[:, :, h : h + 1].astype(x3.dtype), axis=0,
            dtype=f32,
        )
        out_ref[:, h * D : (h + 1) * D] = jnp.dot(
            agg_h.astype(w.dtype),
            w[:, h * D : (h + 1) * D],
            preferred_element_type=f32,
        ).astype(out_ref.dtype)


def _bwd_kernel(
    xn_ref, el_ref, er_ref, mk_ref, w_ref, g_ref,
    dw_ref, del_ref, der_ref, dxn_ref,
    *, K: int, H: int, D: int, slope: float, need_dx: bool,
):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    w = w_ref[:]
    pre_list, alpha = _score_chain(
        el_ref[:], er_ref, mk_ref[:], f32(slope), K
    )
    sb = el_ref.shape[0]
    e_dim = xn_ref.shape[2]
    gout = g_ref[:]
    # d_agg_h = g_h @ W_h^T  (MXU, transposed operand)
    dagg = []
    g_cols = []
    for h in range(H):
        gh = gout[:, h * D : (h + 1) * D]
        g_cols.append(gh)
        dagg.append(
            jax.lax.dot_general(
                gh, w[:, h * D : (h + 1) * D],
                (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        )
    # pass 1 over k: agg recompute, d_alpha, softmax-jacobian diagonal sum.
    # d_alpha via the z-form: sum_e x_k[s,e] dagg_h[s,e] == sum_d
    # g[s,hD+d] (x_k @ W)[s,hD+d] — one MXU matmul + one block-sum
    # contraction per k instead of H multiply+lane-reduce trees (lane
    # reductions measured as the bwd hot spot).
    bsum = (
        jax.lax.broadcasted_iota(jnp.int32, (H * D, H), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (H * D, H), 0) // D
    ).astype(f32)
    gf = gout.astype(f32)
    aggs = [jnp.zeros((sb, e_dim), f32) for _ in range(H)]
    dal_list = []
    T = jnp.zeros((sb, H), f32)
    for k in range(K):
        xk = xn_ref[k]
        a_k = alpha[k]
        for h in range(H):
            aggs[h] = aggs[h] + a_k[:, h : h + 1] * xk
        z_k = jnp.dot(xk, w, preferred_element_type=f32)  # [S_b, H*D]
        dal_k = jnp.dot(z_k * gf, bsum, preferred_element_type=f32)
        dal_list.append(dal_k)
        T = T + a_k * dal_k
    # dW from the projections: agg_h^T @ g_h
    for h in range(H):
        dw_ref[:, h * D : (h + 1) * D] += jax.lax.dot_general(
            aggs[h].astype(w.dtype), g_cols[h],
            (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    # pass 2 over k: softmax/leaky backward -> d_pre per k (= d_er3 block),
    # accumulated into d_el; alpha-path d_x_n when requested
    del_acc = jnp.zeros((sb, H), f32)
    for k in range(K):
        a_k = alpha[k]
        d_s = a_k * (dal_list[k] - T)
        sl = jnp.where(pre_list[k] >= 0, f32(1.0), f32(slope))
        d_pre = d_s * sl  # masked slots: a_k = 0 -> d_s = 0
        del_acc = del_acc + d_pre
        der_ref[k] = d_pre.astype(der_ref.dtype)
        if need_dx:
            dxn = jnp.zeros((sb, e_dim), f32)
            for h in range(H):
                dxn = dxn + a_k[:, h : h + 1] * dagg[h]
            dxn_ref[k] = dxn.astype(dxn_ref.dtype)
    del_ref[:] = del_acc.astype(del_ref.dtype)


def _fwd_call(x_n, el, er3, mask_f, w, slope: float):
    K, S, E = x_n.shape
    H = el.shape[1]
    D = w.shape[1] // H
    sb = _block_rows(E)
    assert S % sb == 0, (S, sb)
    grid = (S // sb,)
    kern = functools.partial(_fwd_kernel, K=K, H=H, D=D, slope=slope)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, sb, E), lambda i: (0, i, 0)),
            pl.BlockSpec((sb, H), lambda i: (i, 0)),
            pl.BlockSpec((K, sb, H), lambda i: (0, i, 0)),
            pl.BlockSpec((sb, K), lambda i: (i, 0)),
            pl.BlockSpec((E, H * D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((sb, H * D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, H * D), x_n.dtype),
        interpret=_interpret(),
    )(x_n, el, er3, mask_f, w)


def _bwd_call(x_n, el, er3, mask_f, w, g, slope: float, need_dx: bool):
    K, S, E = x_n.shape
    H = el.shape[1]
    D = w.shape[1] // H
    # half the forward block: the backward body keeps ~2x the live values
    # (dagg/aggs/dal lists + d_x slabs) and 256-row blocks overflow the
    # 16M scoped VMEM at bench shapes (measured: 18.48M requested)
    sb = max(_block_rows(E) // 2, 32)
    grid = (S // sb,)
    kern = functools.partial(
        _bwd_kernel, K=K, H=H, D=D, slope=slope, need_dx=need_dx
    )
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((E, H * D), f32),  # dw (grid-accumulated)
        jax.ShapeDtypeStruct((S, H), f32),  # d_el
        jax.ShapeDtypeStruct((K, S, H), f32),  # d_er3
    ]
    out_specs = [
        pl.BlockSpec((E, H * D), lambda i: (0, 0)),
        pl.BlockSpec((sb, H), lambda i: (i, 0)),
        pl.BlockSpec((K, sb, H), lambda i: (0, i, 0)),
    ]
    if need_dx:
        out_shape.append(jax.ShapeDtypeStruct((K, S, E), x_n.dtype))
        out_specs.append(pl.BlockSpec((K, sb, E), lambda i: (0, i, 0)))
    else:
        # dummy 1-block output so the kernel arity is static; never read
        out_shape.append(jax.ShapeDtypeStruct((K, sb, E), x_n.dtype))
        out_specs.append(pl.BlockSpec((K, sb, E), lambda i: (0, 0, 0)))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, sb, E), lambda i: (0, i, 0)),
            pl.BlockSpec((sb, H), lambda i: (i, 0)),
            pl.BlockSpec((K, sb, H), lambda i: (0, i, 0)),
            pl.BlockSpec((sb, K), lambda i: (i, 0)),
            pl.BlockSpec((E, H * D), lambda i: (0, 0)),
            pl.BlockSpec((sb, H * D), lambda i: (i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(x_n, el, er3, mask_f, w, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gat_core(x_n, el, er3, mask_f, w, slope: float, need_dx: bool):
    """Softmax+aggregate+project over precomputed SDDMM halves.

    The VJP returns (alpha-path d_x_n, d_el, d_er3, 0, dW); the el/er3
    producers outside differentiate normally, so ``wal``/``war`` and the
    er-path input gradients are ordinary XLA matmuls."""
    return _fwd_call(x_n, el, er3, mask_f, w, slope)


def _core_fwd(x_n, el, er3, mask_f, w, slope, need_dx):
    out = _fwd_call(x_n, el, er3, mask_f, w, slope)
    return out, (x_n, el, er3, mask_f, w)


def _core_bwd(slope, need_dx, res, g):
    x_n, el, er3, mask_f, w = res
    dw, del_, der3, dxn = _bwd_call(
        x_n, el, er3, mask_f, w, g, slope, need_dx
    )
    if not need_dx:
        dxn = jnp.zeros_like(x_n)
    return (
        dxn,
        del_.astype(el.dtype),
        der3.astype(er3.dtype),
        jnp.zeros_like(mask_f),
        dw.astype(w.dtype),
    )


_gat_core.defvjp(_core_fwd, _core_bwd)


def gat_attention(x_dst, x_n, mask_f, wal, war, w, slope: float, need_dx: bool):
    """Fused GAT attention layer over one sampled hop.

    Args:
      x_dst:  [S, E] destination-row inputs (compute dtype, e.g. bf16).
      x_n:    [K, S, E] neighbor inputs, K-MAJOR (slot k of every row
              contiguous) — the native layout of the dedup-free first hop.
      mask_f: [S, K] f32, 1.0 for valid neighbor slots.
      wal/war: [E, H] folded attention vectors W @ A_l / W @ A_r (compute
              dtype) — scores el/er = x @ wal / x @ war.
      w:      [E, H*D] shared projection (compute dtype).
      slope:  LeakyReLU negative slope (static).
      need_dx: static; False lets layer-0 (features input) skip the d_x
              computation entirely (inputs are stop_gradient'ed, so BOTH
              the kernel's alpha path and the outer er-path pullback
              vanish — grads wrt x_dst/x_n are exactly zero).

    Returns [S, H*D]: per-head outputs concatenated on the feature axis
    (head h occupies columns [h*D, (h+1)*D)), in x_n.dtype.
    """
    K, S, E = x_n.shape
    H = wal.shape[1]
    if not need_dx:
        x_dst = jax.lax.stop_gradient(x_dst)
        x_n = jax.lax.stop_gradient(x_n)
    # SDDMM halves as two big MXU matmuls (f32 accumulation)
    el = jnp.dot(x_dst, wal, preferred_element_type=jnp.float32)
    er3 = jnp.dot(
        x_n.reshape(K * S, E), war, preferred_element_type=jnp.float32
    ).reshape(K, S, H)
    return _gat_core(x_n, el, er3, mask_f, w, slope, need_dx)


def gat_attention_reference(x_dst, x_n, mask_f, wal, war, w, slope):
    """Pure-jnp oracle of :func:`gat_attention` (same f32 softmax math)."""
    f32 = jnp.float32
    K, S, E = x_n.shape
    H = wal.shape[1]
    D = w.shape[1] // H
    el = jnp.dot(x_dst, wal, preferred_element_type=f32)  # [S, H]
    er = jnp.einsum("kse,eh->ksh", x_n, war).astype(f32)  # [K, S, H]
    pre = el[None] + er
    s = jnp.where(pre >= 0, pre, pre * slope)
    s = jnp.where(mask_f.T[:, :, None] > 0, s, -1e30)
    gmax = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - gmax) * mask_f.T[:, :, None]
    den = jnp.maximum(jnp.sum(e, axis=0), 1e-12)
    alpha = e / den[None]  # [K, S, H]
    outs = []
    for h in range(H):
        agg = jnp.sum(alpha[:, :, h][:, :, None] * x_n.astype(f32), axis=0)
        outs.append(
            jnp.dot(
                agg.astype(w.dtype), w[:, h * D : (h + 1) * D],
                preferred_element_type=f32,
            )
        )
    return jnp.concatenate(outs, axis=1).astype(x_dst.dtype)
