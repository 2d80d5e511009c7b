"""Measure the fused Pallas GAT kernel at bench layer-0 shapes (round-4 #1).

Baseline (probe_gat1, jnp agp): fwd 2.05 ms, value_and_grad 4.66 ms.
Roofline: ~0.6 ms (3x85MB traffic + 11 GF).

Run: timeout 1800 python -u scripts/probe_gat2.py > /tmp/probe_gat2.log 2>&1
"""

import numpy as np

S, K, H, D_IN, D_OUT = 26624, 15, 4, 100, 128


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op
    from dist_gnn_tpu.ops.gat_pallas import gat_attention, gat_attention_reference

    enable_compile_cache()
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x_dst = jnp.asarray(rng.standard_normal((S, D_IN)), np.float32).astype(bf)
    x_n = jnp.asarray(rng.standard_normal((K, S, D_IN)), np.float32).astype(bf)
    mask_f = jnp.asarray((rng.random((S, K)) < 0.93).astype(np.float32))
    wal = (jnp.asarray(rng.standard_normal((D_IN, H)), np.float32) * 0.1).astype(bf)
    war = (jnp.asarray(rng.standard_normal((D_IN, H)), np.float32) * 0.1).astype(bf)
    w = (jnp.asarray(rng.standard_normal((D_IN, H * D_OUT)), np.float32) * 0.1).astype(bf)

    # correctness on device first
    out = gat_attention(x_dst, x_n, mask_f, wal, war, w, 0.2, False)
    ref = gat_attention_reference(x_dst, x_n, mask_f, wal, war, w, 0.2)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    scale = np.abs(np.asarray(ref, np.float32)).max()
    print(f"max|kernel - ref| = {d:.5f} (scale {scale:.3f})", flush=True)

    def fwd_step(c, xd, xn):
        o = gat_attention(
            xd, xn, mask_f, wal + c[0].astype(bf) * bf(1e-8), war, w, 0.2, False
        )
        return (c[0] * 0.5 + jnp.sum(o.astype(jnp.float32)) * 1e-20 + 1,)

    t = measure_op(fwd_step, (jnp.zeros(()),), iters=16, n_lo=2, n_hi=5,
                   args=(x_dst, x_n))
    print(f"fwd  fused: {t*1e3:7.3f} ms", flush=True)

    def loss(wal_, war_, w_, xd, xn, need_dx):
        o = gat_attention(xd, xn, mask_f, wal_, war_, w_, 0.2, need_dx)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    for need_dx in (False, True):
        g = jax.grad(loss, argnums=(0, 1, 2))

        def gstep(c, xd, xn, g=g, nd=need_dx):
            gr = g(wal + c[0].astype(bf) * bf(1e-8), war, w, xd, xn, nd)
            tot = sum(jnp.sum(x.astype(jnp.float32)) for x in gr)
            return (c[0] * 0.5 + tot * 1e-20 + 1,)

        t = measure_op(gstep, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
                       args=(x_dst, x_n))
        print(f"grad fused (need_dx={need_dx}): {t*1e3:7.3f} ms", flush=True)

    # layer-1 shapes: S=3072, K=10, E=512 (hidden H*D), non-contig gather done outside
    S1, K1, E1 = 3072, 10, 512
    x1 = jnp.asarray(rng.standard_normal((S1, E1)), np.float32).astype(bf)
    xn1 = jnp.asarray(rng.standard_normal((K1, S1, E1)), np.float32).astype(bf)
    m1 = jnp.asarray((rng.random((S1, K1)) < 0.9).astype(np.float32))
    wal1 = (jnp.asarray(rng.standard_normal((E1, H)), np.float32) * 0.1).astype(bf)
    war1 = (jnp.asarray(rng.standard_normal((E1, H)), np.float32) * 0.1).astype(bf)
    w1 = (jnp.asarray(rng.standard_normal((E1, H * D_OUT)), np.float32) * 0.1).astype(bf)

    def loss1(wal_, war_, w_, xd, xn):
        o = gat_attention(xd, xn, m1, wal_, war_, w_, 0.2, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss1, argnums=(0, 1, 2))

    def gstep1(c, xd, xn):
        gr = g1(wal1 + c[0].astype(bf) * bf(1e-8), war1, w1, xd, xn)
        tot = sum(jnp.sum(x.astype(jnp.float32)) for x in gr)
        return (c[0] * 0.5 + tot * 1e-20 + 1,)

    t = measure_op(gstep1, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5, args=(x1, xn1))
    print(f"grad fused layer-1 (S={S1},K={K1},E={E1}): {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
