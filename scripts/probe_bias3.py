"""top-k engine shootout for the Gumbel samplers (probe_bias2 follow-up).

probe_bias2: L2's chunked top_k at [5120, 2048] k=15 costs ~1.5 ms —
the dominant remaining biased-sampler cost.  Candidates:

  top_k        — XLA variadic-sort lowering (current)
  approx_max_k — TPU PartialReduce lowering, recall_target=1.0 (exact)
  approx95     — recall_target=0.95 (NOT exact; measured for the ceiling)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python -u \
    scripts/probe_bias3.py > /tmp/probe_bias3.log 2>&1
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op

    enable_compile_cache()
    rng = np.random.default_rng(0)
    k = 15

    shapes = ((26624, 256), (40960, 256), (5120, 2048), (3072, 1024))
    for B, W in shapes:
        x = jnp.asarray(rng.standard_normal((B, W)).astype(np.float32))

        def t(name, body, iters=8):
            def step(c, x):
                v, p = body(x + c[0] * 1e-9)
                return (c[0] * 0.5 + jnp.sum(v) * 1e-20
                        + jnp.sum(p) * 1e-20 + 1,)

            dt = measure_op(
                step, (jnp.zeros(()),), iters=iters, n_lo=2, n_hi=5,
                args=(x,),
            )
            print(f"[{B:6d},{W:5d}] {name:24s} {dt*1e3:7.3f} ms", flush=True)

        t("top_k", lambda x: jax.lax.top_k(x, k))
        t("approx_max_k r=1.0", lambda x: jax.lax.approx_max_k(
            x, k, recall_target=1.0))
        t("approx_max_k r=0.95", lambda x: jax.lax.approx_max_k(
            x, k, recall_target=0.95))
        # aggregate_to_topk=False returns more than k candidates from the
        # partial reduce — pair with a narrow exact top_k second stage
        def pr_then_topk(x):
            v, p = jax.lax.approx_max_k(
                x, k, recall_target=1.0, aggregate_to_topk=False
            )
            v2, s = jax.lax.top_k(v, k)
            cand = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1, v.shape[1]), 2)
            hit = cand == s[:, :, None]
            p2 = jnp.sum(jnp.where(hit, p[:, None, :], 0), axis=2)
            return v2, p2
        t("pr(agg=F)+top_k", pr_then_topk)

    # correctness spot check (values only; ties ~impossible in f32 randn)
    x = jnp.asarray(rng.standard_normal((512, 2048)).astype(np.float32))
    v0, p0 = jax.lax.top_k(x, k)
    v1, p1 = jax.lax.approx_max_k(x, k, recall_target=1.0)
    print("exact match r=1.0:", bool(jnp.all(v0 == v1)),
          "pos match:", bool(jnp.all(p0 == p1)), flush=True)


if __name__ == "__main__":
    main()
