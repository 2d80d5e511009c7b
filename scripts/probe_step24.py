"""Probe: GAT layer-0 piece-by-piece (fwd only) to find the 13 ms.

Pieces at bench shapes (frontier 425984, S=26624, k=16, H=4, d=128):
  a. projection matmul h @ w -> z [425984, 512]
  b. + el/er head-dot einsums
  c. + reshape to [S, H, d] + scores + masked softmax
  d. + aggregation einsum (full fwd layer 0)
  e. flat-matmul el/er variant (z @ [512, 8] block matrix, no reshape)
  f. aggregation via sum(z_n * alpha) (the pre-einsum formulation)

Run in background; writes /tmp/probe24.log
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.ops.spmm import masked_segment_softmax
from dist_gnn_tpu.utils.timing import measure_op

S, K, H, D = 26_624, 15, 4, 128
F = 425_984  # frontier rows
IN = 100


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((F, IN)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(
        rng.standard_normal((IN, H * D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    a_l = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32))
    a_r = jnp.asarray(rng.standard_normal((H, D)).astype(np.float32))
    nmask = jnp.asarray(rng.random((S, K)) < 0.95)
    jax.block_until_ready((h, w, a_l, a_r, nmask))

    def bench(name, fn, init, iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def proj(c, h, w):
        hh = h + (c % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        z = jnp.dot(hh, w, preferred_element_type=jnp.float32).astype(hh.dtype)
        return (c + jnp.sum(z.astype(jnp.float32)).astype(jnp.int32) % 3 + 1) % 97

    bench("a) projection [425984,100]@[100,512]", proj, jnp.int32(0),
          args=(h, w))

    def proj_el(c, h, w):
        hh = h + (c % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        z = jnp.dot(hh, w, preferred_element_type=jnp.float32).astype(hh.dtype)
        z4 = z.reshape(F, H, D)
        el = jnp.einsum("shd,hd->sh", z4, a_l.astype(z.dtype))
        er = jnp.einsum("shd,hd->sh", z4, a_r.astype(z.dtype))
        return (c + (jnp.sum(el) + jnp.sum(er)).astype(jnp.int32) % 3 + 1) % 97

    bench("b) + el/er einsums (reshape form)", proj_el, jnp.int32(0),
          args=(h, w))

    # flat block-matrix el/er
    A = np.zeros((H * D, 2 * H), np.float32)
    for hh_ in range(H):
        A[hh_ * D : (hh_ + 1) * D, hh_] = np.asarray(a_l)[hh_]
        A[hh_ * D : (hh_ + 1) * D, H + hh_] = np.asarray(a_r)[hh_]
    A = jnp.asarray(A).astype(jnp.bfloat16)

    def proj_el_flat(c, h, w, A):
        hh = h + (c % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        z = jnp.dot(hh, w, preferred_element_type=jnp.float32).astype(hh.dtype)
        eler = jnp.dot(z, A, preferred_element_type=jnp.float32)  # [F, 2H]
        return (c + jnp.sum(eler).astype(jnp.int32) % 3 + 1) % 97

    bench("e) + el/er as flat [512,8] matmul", proj_el_flat, jnp.int32(0),
          args=(h, w, A))

    def full_fwd(c, h, w, agg):
        hh = h + (c % 3).astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        z = jnp.dot(hh, w, preferred_element_type=jnp.float32).astype(hh.dtype)
        z4 = z.reshape(F, H, D)
        el = jnp.einsum("shd,hd->sh", z4, a_l.astype(z.dtype))[:S]
        er = jnp.einsum("shd,hd->sh", z4, a_r.astype(z.dtype))
        er_n = er[S:].reshape(S, K, H)
        scores = jax.nn.leaky_relu(el[:, None, :] + er_n, 0.2)
        alpha = masked_segment_softmax(scores, nmask)
        z_n = z[S:].reshape(S, K, H, D)
        if agg == "einsum":
            out = jnp.einsum("skh,skhd->shd", alpha.astype(z_n.dtype), z_n,
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.sum(z_n * alpha[..., None].astype(z_n.dtype), axis=1)
        return (c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 3 + 1) % 97

    bench("d) full layer-0 fwd (einsum agg)",
          lambda c, h, w: full_fwd(c, h, w, "einsum"), jnp.int32(0),
          args=(h, w))
    bench("f) full layer-0 fwd (mul+sum agg)",
          lambda c, h, w: full_fwd(c, h, w, "mulsum"), jnp.int32(0),
          args=(h, w))

    # honest top_k at the gumbel L1 shape (non-foldable data dependence)
    from dist_gnn_tpu.ops.sampling import _topk_hier

    g256 = jnp.asarray(rng.standard_normal((26_624, 256)).astype(np.float32))

    def tk_l1(c, g):
        gg = g * (1.0 + (c % 5).astype(jnp.float32) * 1e-6)
        v, p = jax.lax.top_k(gg, 15)
        return (c + (jnp.sum(v) + jnp.sum(p).astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("top_k [26624,256] k=15 HONEST", tk_l1, jnp.int32(0), args=(g256,))

    def tk_l1h(c, g):
        gg = g * (1.0 + (c % 5).astype(jnp.float32) * 1e-6)
        v, p = _topk_hier(gg, 15, chunk=64)
        return (c + (jnp.sum(v) + jnp.sum(p).astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("topk_hier(chunk=64) [26624,256] k=15", tk_l1h, jnp.int32(0),
          args=(g256,))

    g2048 = jnp.asarray(rng.standard_normal((5_120, 2048)).astype(np.float32))

    def tk_l2h(c, g):
        gg = g * (1.0 + (c % 5).astype(jnp.float32) * 1e-6)
        v, p = _topk_hier(gg, 15)
        return (c + (jnp.sum(v) + jnp.sum(p).astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("topk_hier(chunk=256) [5120,2048] k=15", tk_l2h, jnp.int32(0),
          args=(g2048,))


if __name__ == "__main__":
    main()
