"""Biased hop-3 dissection (round-4 VERDICT #4): account for the 3.7 ms
windowed-Gumbel hop at [26624, 15] vs the ~2.4 ms uniform hop.

Phases measured cumulatively (measure_op device-side loops):
  ext    — row extents + row keys
  fetch  — + L1 combo [B, 4W1] pair-window gather
  keys   — + per-window-elem bits + log(u)/w Gumbel keys
  topk   — + _topk_hier top-k over [B, 2W1]
  onehot — + one-hot id select [B, k, 2W1]
  L1     — full level-1 (== onehot + masks/fits)
  L2     — + compaction + level-2 at W2 ([R1, 2W2] windows)
  full   — complete sample_biased_windowed (3 levels + scatter-backs)

Run: timeout 2400 python -u scripts/probe_bias6.py > /tmp/probe_bias6.log 2>&1
"""

import numpy as np

B, K = 26624, 15
W1, W2 = 128, 1024
R1, R2 = 5120, 1024


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import measure_op
    from dist_gnn_tpu.dataloading.preprocess import (
        add_random_probs, make_synthetic_dataset,
    )
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.ops import sampling as S
    from dist_gnn_tpu.ops import prng

    enable_compile_cache()
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=8, num_classes=4,
        train_frac=0.2, seed=0,
    )
    hg = HostGraph(
        indptr=arrays["indptr"], indices=arrays["indices"],
        probs=add_random_probs(int(meta["num_edges"])),
    )
    graph = hg.to_device(
        with_alias=True, with_indptr_pairs=True, window_pair=(W1, W2)
    )
    # degree-biased frontier like the real hop-3 (neighbors of a sampled
    # hop-2 frontier): draw uniform edges, take their sources
    rng = np.random.default_rng(0)
    e = rng.integers(0, int(meta["num_edges"]), B)
    seeds_np = np.asarray(arrays["indices"])[e].astype(np.int32)
    seeds = jnp.asarray(seeds_np)

    def phase_ext(key, graph):
        start, deg, valid = S._row_extents(graph, seeds)
        row_key = prng.random_keys(key, (B,))
        return (jnp.sum(start) + jnp.sum(deg)).astype(jnp.float32) + jnp.sum(
            row_key.astype(jnp.float32) * 1e-9
        )

    def mk_l1_parts(stop):
        def f(key, graph):
            start, deg, valid = S._row_extents(graph, seeds)
            row_key = prng.random_keys(key, (B,))
            num_edges = graph.num_edges
            n_rows = -(-num_edges // W1)
            r0 = jnp.clip((start // W1).astype(jnp.int32), 0, max(n_rows - 2, 0))
            adj0 = (start - r0.astype(start.dtype) * W1).astype(jnp.int32)
            fits = valid & (adj0 + deg <= 2 * W1) & (deg > 0)
            C, rows_a = S._bias_pair(graph, W1)
            row = jnp.where(r0 % 2 == 0, r0 // 2, rows_a + (r0 - 1) // 2)
            both = C[row]
            wids = both[:, : 2 * W1]
            wprob = jax.lax.bitcast_convert_type(both[:, 2 * W1 :], jnp.float32)
            if stop == "fetch":
                return jnp.sum(wids).astype(jnp.float32) + jnp.sum(wprob)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * W1), 1)
            in_row = (col >= adj0[:, None]) & (col < (adj0 + deg)[:, None])
            bits = prng.mix32(
                row_key[:, None]
                ^ prng.mix32((col ^ jnp.int32(0x1111)).astype(jnp.uint32))
            )
            u = prng.bits_to_uniform(bits)
            w = jnp.where(in_row & fits[:, None], wprob, 0.0)
            gl = jnp.where(w > 0, jnp.log(u) / w, -jnp.float32(jnp.inf))
            if stop == "keys":
                return jnp.sum(jnp.where(jnp.isfinite(gl), gl, 0.0))
            top_vals, top_pos = S._topk_hier(gl, K)
            if stop == "topk":
                return jnp.sum(
                    jnp.where(jnp.isfinite(top_vals), top_vals, 0.0)
                ) + jnp.sum(top_pos).astype(jnp.float32)
            hit = col[:, None, :] == top_pos[:, :, None]
            ids = jnp.sum(jnp.where(hit, wids[:, None, :], 0), axis=2)
            return jnp.sum(ids).astype(jnp.float32)
        return f

    def phase_l1(key, graph):
        start, deg, valid = S._row_extents(graph, seeds)
        row_key = prng.random_keys(key, (B,))
        ids1, sel1, got1, fits1 = S._gumbel_window_level(
            graph, start, deg, valid, K, row_key, W1, 0x1111
        )
        return jnp.sum(jnp.where(got1, ids1, 0)).astype(jnp.float32)

    def phase_l2(key, graph):
        start, deg, valid = S._row_extents(graph, seeds)
        row_key = prng.random_keys(key, (B,))
        ids1, sel1, got1, fits1 = S._gumbel_window_level(
            graph, start, deg, valid, K, row_key, W1, 0x1111
        )
        rest1 = valid & ~fits1 & (deg > 0)
        (c_start, c_deg, c_key), inv1, filled1, in_b1 = S._compact_rows_scalar(
            (start, deg, row_key), rest1, min(R1, S._round_up8(B))
        )
        ids2, sel2, got2, fits2 = S._gumbel_window_level(
            graph, c_start, c_deg.astype(jnp.int32), filled1, K,
            c_key.astype(jnp.uint32), W2, 0x2222,
        )
        return (
            jnp.sum(jnp.where(got1, ids1, 0)).astype(jnp.float32)
            + jnp.sum(jnp.where(got2, ids2, 0)).astype(jnp.float32)
        )

    def phase_full(key, graph):
        nb = S.sample_biased_windowed(
            graph, seeds, K, key, window=(W1, W2), big_row_budget=(R1, R2)
        )
        return jnp.sum(jnp.where(nb.mask, nb.ids, 0)).astype(jnp.float32)

    # stats: how many rows fall to each level
    start, deg, valid = S._row_extents(graph, seeds)
    adj0 = (start % W1).astype(np.int32)
    n_l2 = int(jnp.sum((jnp.asarray(adj0) + deg > 2 * W1) & (deg > 0)))
    adj0b = (start % W2).astype(np.int32)
    n_tail = int(jnp.sum((jnp.asarray(adj0b) + deg > 2 * W2) & (deg > 0)))
    print(f"rows: B={B}  to-L2={n_l2}  to-tail={n_tail}", flush=True)

    phases = [
        ("ext", phase_ext),
        ("fetch", mk_l1_parts("fetch")),
        ("keys", mk_l1_parts("keys")),
        ("topk", mk_l1_parts("topk")),
        ("onehot", mk_l1_parts("onehot")),
        ("L1", phase_l1),
        ("L2", phase_l2),
        ("full", phase_full),
    ]
    for name, f in phases:
        # graph passed via args= — big closure constants serialize into the
        # tunneled compile request (NOTES #8: HTTP 413 above ~250 MB)
        def stepf(c, graph, f=f):
            key = jax.random.fold_in(jax.random.key(5), c[0].astype(jnp.int32))
            return (c[0] * 0.5 + f(key, graph) * 1e-20 + 1,)

        t = measure_op(stepf, (jnp.zeros(()),), iters=8, n_lo=2, n_hi=5,
                       args=(graph,))
        print(f"{name:7s}: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
