"""L2 (hub window) dissection of the biased sampler + MXU one-hot select.

After probe_bias1 round 2 (combined ids|probs pair + packed alias tail):
hop-3 biased = 4.98 ms, of which L2 gumbel (W2=1024, R1=5120) = 2.06 ms.
This probe splits L2 into fetch / gl / topk / id-select and tests a
matmul (MXU) formulation of the one-hot id select vs the VPU
compare+mask+reduce.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u \
    scripts/probe_bias2.py > /tmp/probe_bias_l2.log 2>&1
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op

    enable_compile_cache()

    from dist_gnn_tpu.dataloading.preprocess import (
        add_random_probs,
        make_synthetic_dataset,
    )
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.ops import prng
    from dist_gnn_tpu.ops import sampling as S

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
    B, k = 26624, 15
    W2, R1 = 1024, 5120
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
        print(f"  {name:36s} {t*1e3:7.3f} ms", flush=True)

    def l2_prefix(g, seeds, key, upto):
        st, deg, valid = S._row_extents(g, seeds)
        rk = prng.random_keys(key, (B,))
        (c_st, c_deg, c_key), inv1, filled1, in_b1 = S._compact_rows_scalar(
            (st, deg, rk), valid & (deg > 200), R1
        )
        start, deg2, row_mask = c_st, c_deg.astype(jnp.int32), filled1
        row_key = c_key.astype(jnp.uint32)
        if upto == "compact":
            return (start, deg2, row_mask)
        num_edges = g.num_edges
        n_rows = -(-num_edges // W2)
        r0 = jnp.clip((start // W2).astype(jnp.int32), 0, max(n_rows - 2, 0))
        adj0 = (start - r0.astype(start.dtype) * W2).astype(jnp.int32)
        fits = row_mask & (adj0 + deg2 <= 2 * W2) & (deg2 > 0)
        combo = S._bias_pair(g, W2)
        C, rows_a = combo
        row = jnp.where(r0 % 2 == 0, r0 // 2, rows_a + (r0 - 1) // 2)
        both = C[row]
        wids = both[:, : 2 * W2]
        wprob = jax.lax.bitcast_convert_type(both[:, 2 * W2 :], jnp.float32)
        if upto == "fetch":
            return (wids, wprob)
        col = jax.lax.broadcasted_iota(jnp.int32, (R1, 2 * W2), 1)
        in_row = (col >= adj0[:, None]) & (col < (adj0 + deg2)[:, None])
        bits = prng.mix32(
            row_key[:, None]
            ^ prng.mix32((col ^ jnp.int32(0x2222)).astype(jnp.uint32))
        )
        u = prng.bits_to_uniform(bits)
        w = jnp.where(in_row & fits[:, None], wprob, 0.0)
        gl = jnp.where(w > 0, jnp.log(u) / w, -jnp.float32(jnp.inf))
        if upto == "gl":
            return (gl,)
        top_vals, top_pos = S._topk_hier(gl, k)
        if upto == "topk":
            return (top_vals, top_pos)
        got = (top_vals > -jnp.float32(jnp.inf)) & fits[:, None]
        if upto == "select_vpu":
            hit = col[:, None, :] == top_pos[:, :, None]
            ids = jnp.sum(jnp.where(hit, wids[:, None, :], 0), axis=2)
            return (ids, got)
        if upto == "select_mxu":
            # one-hot select as f32 matmul: exact for ids < 2^24
            hit = (col[:, None, :] == top_pos[:, :, None]).astype(jnp.float32)
            ids = jax.lax.dot_general(
                hit, wids.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
            return (ids, got)
        raise ValueError(upto)

    for stage in ("compact", "fetch", "gl", "topk", "select_vpu",
                  "select_mxu"):
        t_internal(f"L2 upto {stage}", lambda g, s, kk, st=stage: l2_prefix(g, s, kk, st))

    # topk_hier chunk-size scan at [R1, 2048]
    gl_fixed = jnp.asarray(
        rng.standard_normal((R1, 2 * W2)).astype(np.float32)
    )

    for chunk in (128, 256, 512):
        def tk(c, gl):
            v, p = S._topk_hier(gl + c[0] * 1e-9, k, chunk=chunk)
            return (c[0] * 0.5 + jnp.sum(v) * 1e-20 + jnp.sum(p) * 1e-20 + 1,)

        t = measure_op(
            tk, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5, args=(gl_fixed,)
        )
        print(f"  topk_hier chunk={chunk:4d}            {t*1e3:7.3f} ms",
              flush=True)

    # plain top_k for reference
    def tk0(c, gl):
        v, p = jax.lax.top_k(gl + c[0] * 1e-9, k)
        return (c[0] * 0.5 + jnp.sum(v) * 1e-20 + jnp.sum(p) * 1e-20 + 1,)

    t = measure_op(
        tk0, (jnp.zeros(()),), iters=4, n_lo=2, n_hi=4, args=(gl_fixed,)
    )
    print(f"  lax.top_k plain                  {t*1e3:7.3f} ms", flush=True)

    # L1-shaped one-hot select comparison at [26624, 15, 256]
    wids1 = jnp.asarray(rng.integers(0, 500_000, (B, 256)).astype(np.int32))
    pos1 = jnp.asarray(rng.integers(0, 256, (B, k)).astype(np.int32))
    col1 = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)

    def sel_vpu(c, wids, pos):
        hit = col1[:, None, :] == (pos + c[0].astype(jnp.int32) % 2)[:, :, None]
        ids = jnp.sum(jnp.where(hit, wids[:, None, :], 0), axis=2)
        return (c[0] * 0.5 + jnp.sum(ids) * 1e-20 + 1,)

    def sel_mxu(c, wids, pos):
        hit = (col1[:, None, :] == (pos + c[0].astype(jnp.int32) % 2)[:, :, None]).astype(jnp.float32)
        ids = jax.lax.dot_general(
            hit, wids.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return (c[0] * 0.5 + jnp.sum(ids) * 1e-20 + 1,)

    for name, fn in (("L1 sel vpu [26624,15,256]", sel_vpu),
                     ("L1 sel mxu [26624,15,256]", sel_mxu)):
        t = measure_op(
            fn, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
            args=(wids1, pos1),
        )
        print(f"  {name:32s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
