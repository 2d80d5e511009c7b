"""Biased windowed-Gumbel sampler dissection at bench shapes (VERDICT #2).

BENCH_r02: bias-alias 18.5M edges/s vs uniform 49M.  NOTES: bias step
22.8 ms vs 8.2 uniform → the biased sampler costs ~17 ms vs 3.4 uniform.
Measures sample_biased_windowed per hop shape and its internal levels to
find where the 5x goes.

Run on the real TPU:
  timeout 1800 python -u scripts/probe_bias1.py > /tmp/probe_bias1.log 2>&1
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from dist_gnn_tpu.dataloading.preprocess import (
        add_random_probs,
        make_synthetic_dataset,
    )
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.ops import sampling as S
    from dist_gnn_tpu.ops.sampling import (
        sample_biased_windowed,
        sample_uniform,
    )
    from dist_gnn_tpu.utils.timing import measure_op

    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=8, num_classes=4,
        train_frac=0.2, seed=0,
    )
    hg = HostGraph(
        indptr=arrays["indptr"], indices=arrays["indices"],
        probs=add_random_probs(int(meta["num_edges"])),
    )
    graph = hg.to_device(
        with_alias=True, with_indptr_pairs=True, window_pair=(128, 1024)
    )
    print("graph ready", flush=True)

    rng = np.random.default_rng(1)
    W = (128, 1024)
    R = (5120, 1024)

    def t_sampler(fn, B, k, **kw):
        seeds0 = jnp.asarray(rng.integers(0, 500_000, B).astype(np.int32))

        def step(c, g, seeds):
            key = jax.random.fold_in(jax.random.key(3), c[0].astype(jnp.int32))
            nb = fn(g, seeds, k, **kw, key=key)
            return (
                c[0] * 0.5
                + jnp.sum(nb.ids).astype(jnp.float32) * 1e-20
                + jnp.sum(nb.mask) * 1e-20
                + 1,
            )

        return measure_op(
            step, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
            args=(graph, seeds0),
        )

    for B, k in ((512, 15), (3072, 10), (26624, 15)):
        tu = t_sampler(
            sample_uniform, B, k, replace=False, window=W, big_row_budget=R
        )
        tb = t_sampler(
            sample_biased_windowed, B, k, window=W, big_row_budget=R
        )
        print(f"B={B:6d} k={k:2d}: uniform {tu*1e3:7.3f} ms   "
              f"biased {tb*1e3:7.3f} ms", flush=True)

    # ---- internals at the hop-3 shape --------------------------------------
    B, k = 26624, 15
    seeds0 = jnp.asarray(rng.integers(0, 500_000, B).astype(np.int32))

    def t_internal(name, body):
        def step(c, g, seeds):
            key = jax.random.fold_in(jax.random.key(3), c[0].astype(jnp.int32))
            out = body(g, seeds, key)
            acc = sum(jnp.sum(o).astype(jnp.float32) * 1e-20 for o in out)
            return (c[0] * 0.5 + acc + 1,)

        t = measure_op(
            step, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
            args=(graph, seeds0),
        )
        print(f"  {name:28s} {t*1e3:7.3f} ms", flush=True)

    from dist_gnn_tpu.ops import prng

    def extents(g, seeds, key):
        st, deg, valid = S._row_extents(g, seeds)
        return (st, deg, valid)

    t_internal("extents", extents)

    def level1(g, seeds, key):
        st, deg, valid = S._row_extents(g, seeds)
        rk = prng.random_keys(key, (B,))
        ids1, sel1, got1, fits1 = S._gumbel_window_level(
            g, st, deg, valid, k, rk, 128, 0x1111
        )
        return (ids1, sel1, got1, fits1)

    t_internal("L1 gumbel window (W=128)", level1)

    def level1_topk_only(g, seeds, key):
        # the gl build + topk without the id one-hot select
        st, deg, valid = S._row_extents(g, seeds)
        rk = prng.random_keys(key, (B,))
        num_edges = g.num_edges
        n_rows = -(-num_edges // 128)
        r0 = jnp.clip((st // 128).astype(jnp.int32), 0, max(n_rows - 2, 0))
        adj0 = (st - r0.astype(st.dtype) * 128).astype(jnp.int32)
        fits = valid & (adj0 + deg <= 256) & (deg > 0)
        (wprob,), _ = S._window_select_raw((g.probs,), num_edges, r0, 128)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
        in_row = (col >= adj0[:, None]) & (col < (adj0 + deg)[:, None])
        bits = prng.mix32(
            rk[:, None] ^ prng.mix32((col ^ jnp.int32(0x1111)).astype(jnp.uint32))
        )
        u = prng.bits_to_uniform(bits)
        w = jnp.where(in_row & fits[:, None], wprob, 0.0)
        gl = jnp.where(w > 0, jnp.log(u) / w, -jnp.float32(jnp.inf))
        tv, tp = S._topk_hier(gl, k)
        return (tv, tp)

    t_internal("L1 gl+topk (no id select)", level1_topk_only)

    def level2(g, seeds, key):
        # hub level at its compacted shape [R1=5120], W2=1024
        st, deg, valid = S._row_extents(g, seeds)
        rk = prng.random_keys(key, (B,))
        (c_st, c_deg, c_key), inv1, filled1, in_b1 = S._compact_rows_scalar(
            (st, deg, rk), valid & (deg > 200), 5120
        )
        ids2, sel2, got2, fits2 = S._gumbel_window_level(
            g, c_st, c_deg.astype(jnp.int32), filled1, k,
            c_key.astype(jnp.uint32), 1024, 0x2222,
        )
        return (ids2, sel2, got2, fits2)

    t_internal("L2 gumbel window (W=1024)", level2)

    def tail(g, seeds, key):
        st, deg, valid = S._row_extents(g, seeds)
        rk = prng.random_keys(key, (B,))
        (t_st, t_deg, t_key), inv2, filled2, in_b2 = S._compact_rows_scalar(
            (st, deg, rk), valid & (deg > 1000), 1024
        )
        out = S._alias_distinct_tail(
            g, t_st, t_deg.astype(jnp.int32), filled2, k,
            t_key.astype(jnp.uint32),
        )
        return out[:3]

    t_internal("alias tail (R2=1024)", tail)


if __name__ == "__main__":
    main()
