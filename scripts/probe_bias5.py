"""Bisect the approx_max_k composite regression (probe_bias4 follow-up).

probe_bias4: new PartialReduce top-k engine improved every standalone
level (L1 1.18->0.61, L2 2.06->1.57) but the FULL sample_biased_windowed
got WORSE (B=512: 3.6 -> 6.8 ms).  Measure the full sampler under four
top-k engines by monkeypatching ops.sampling._topk_hier.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python -u \
    scripts/probe_bias5.py > /tmp/probe_bias5.log 2>&1
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
    W = (128, 1024)
    R = (5120, 1024)

    def topk_sort(x, k, chunk=256):
        """old engine: chunked lax.top_k"""
        B, Wd = x.shape
        if Wd <= 2 * chunk or Wd % chunk:
            return jax.lax.top_k(x, k)
        n = Wd // chunk
        kc = min(k, chunk)
        v1, p1 = jax.lax.top_k(x.reshape(B * n, chunk), kc)
        v1 = v1.reshape(B, n * kc)
        base = (
            jax.lax.broadcasted_iota(jnp.int32, (B, n, kc), 1) * chunk
        ).reshape(B, n * kc)
        p1g = p1.reshape(B, n * kc) + base
        v2, p2 = jax.lax.top_k(v1, k)
        cand = jax.lax.broadcasted_iota(jnp.int32, (B, 1, n * kc), 2)
        hit = cand == p2[:, :, None]
        pos = jnp.sum(jnp.where(hit, p1g[:, None, :], 0), axis=2)
        return v2, pos

    def topk_pr(x, k, chunk=256):
        """new engine: approx_max_k r=1.0 (narrow) / agg=False (wide)"""
        B, Wd = x.shape
        if Wd <= 2 * chunk:
            return jax.lax.approx_max_k(x, k, recall_target=1.0)
        v, p = jax.lax.approx_max_k(
            x, k, recall_target=1.0, aggregate_to_topk=False
        )
        L = v.shape[1]
        if L <= k:
            return jax.lax.top_k(x, k)
        v2, s = jax.lax.top_k(v, k)
        cand = jax.lax.broadcasted_iota(jnp.int32, (B, 1, L), 2)
        hit = cand == s[:, :, None]
        pos = jnp.sum(jnp.where(hit, p[:, None, :], 0), axis=2)
        return v2, pos

    def topk_narrow_only(x, k, chunk=256):
        return topk_pr(x, k) if x.shape[1] <= 2 * chunk else topk_sort(x, k)

    def topk_wide_only(x, k, chunk=256):
        return topk_sort(x, k) if x.shape[1] <= 2 * chunk else topk_pr(x, k)

    # probe L size of the wide partial reduce
    v, p = jax.eval_shape(
        lambda x: jax.lax.approx_max_k(
            x, 15, recall_target=1.0, aggregate_to_topk=False
        ),
        jax.ShapeDtypeStruct((5120, 2048), jnp.float32),
    )
    print("wide agg=False candidate count L =", v.shape[1], flush=True)

    engines = {
        "sort (old)": topk_sort,
        "pr (new)": topk_pr,
        "pr narrow only": topk_narrow_only,
        "pr wide only": topk_wide_only,
    }
    for B, k in ((512, 15), (26624, 15)):
        seeds0 = jnp.asarray(rng.integers(0, 500_000, B).astype(np.int32))
        for name, eng in engines.items():
            S._topk_hier = eng
            jax.clear_caches()

            def step(c, g, seeds):
                key = jax.random.fold_in(
                    jax.random.key(3), c[0].astype(jnp.int32)
                )
                nb = S.sample_biased_windowed.__wrapped__(
                    g, seeds, k, key, window=W, big_row_budget=R
                )
                return (
                    c[0] * 0.5
                    + jnp.sum(nb.ids).astype(jnp.float32) * 1e-20
                    + jnp.sum(nb.mask) * 1e-20
                    + 1,
                )

            t = measure_op(
                step, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
                args=(graph, seeds0),
            )
            print(f"B={B:6d} {name:16s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
