"""Distributed scaling benchmark (round-4 VERDICT #5).

Drives the full ``DistTrainer`` — data-parallel seeds, node-range-sharded
feature store, lossless all-to-all exchange, gradient psum, all in one
jitted shard_map — on an n-device mesh, and prints ONE JSON line with:

  * aggregate sampled edges/s and per-step wall time,
  * the per-step exchange VOLUME model (requested rows, remote fraction,
    bytes per chip over ICI at the configured budgets),
  * overflow / unserved counters (must be 0 — the exchange is lossless),
  * the calibrated CostModel's PREDICTED scaling at 2/4/8/16 chips, so a
    day-1 run on real multi-chip hardware has a yardstick.

Runs TODAY on the virtual CPU mesh (`--platform cpu`, the default when
real chips are missing): same program, correctness + volume accounting —
CPU wall times are NOT TPU performance.  On a real multi-chip slice run
``python bench_dist.py --platform tpu`` unchanged.

Reference analog: the multi-node script + per-phase report of
``example/graphsage/node_classification_dist.py:305-343``.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-devices", type=int, default=8)
    ap.add_argument(
        "--platform", choices=["auto", "cpu", "tpu"], default="auto",
        help="cpu = virtual host-device mesh; tpu = real chips",
    )
    ap.add_argument("--nodes", type=int, default=0, help="0 = platform default")
    ap.add_argument("--avg-degree", type=int, default=0)
    ap.add_argument("--feature-dim", type=int, default=0)
    ap.add_argument("--batch-per-chip", type=int, default=0)
    ap.add_argument("--fan-out", type=str, default="")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--hot-frac", type=float, default=0.0,
                    help=">0: heat-planned hot tier of this row fraction")
    ap.add_argument("--quantize", action="store_true",
                    help="int8-packed store + capacity-aware hot plan "
                         "(same byte budget admits ~4x hot rows)")
    ap.add_argument("--two-tier", action="store_true",
                    help="('host','data') mesh with hierarchical exchange")
    args = ap.parse_args()

    import jax

    on_tpu = args.platform == "tpu" or (
        args.platform == "auto" and len(jax.devices()) >= args.n_devices
        and jax.default_backend() != "cpu"
    )
    if not on_tpu:
        from dist_gnn_tpu.utils.platform import force_cpu

        force_cpu(args.n_devices)
    from dist_gnn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dist_gnn_tpu.cache.cost_model import CostModel
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import SAGE
    from dist_gnn_tpu.parallel import DistTrainer, ShardedFeatureStore, make_mesh
    from dist_gnn_tpu.sampler import sample_blocks

    n = args.n_devices
    assert len(jax.devices()) >= n, (len(jax.devices()), n)
    # platform defaults: TPU mirrors bench.py's products-like config; CPU
    # shrinks it so the volume model runs in seconds
    if on_tpu:
        N = args.nodes or 500_000
        deg = args.avg_degree or 30
        F = args.feature_dim or 100
        B = args.batch_per_chip or 512
        fan_out = tuple(
            int(x) for x in (args.fan_out or "15,10,5").split(",")
        )
    else:
        N = args.nodes or 60_000
        deg = args.avg_degree or 10
        F = args.feature_dim or 64
        B = args.batch_per_chip or 128
        fan_out = tuple(int(x) for x in (args.fan_out or "10,5").split(","))

    arrays, meta = make_synthetic_dataset(
        num_nodes=N, avg_degree=deg, feature_dim=F,
        num_classes=32, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()  # structure replicated (bench.py parity config)

    if args.two_tier:
        assert n % 2 == 0 and n >= 4
        mesh = make_mesh(n, axis_names=("host", "data"), hosts=2)
        ax = ("host", "data")
    else:
        mesh = make_mesh(n)
        ax = "data"

    feats_np = np.asarray(arrays["features"], np.float32)
    if on_tpu:
        # bf16 rows — bench.py parity; the exchange-volume model below
        # prices rows at F*2 B on TPU, so the store must actually ship
        # bf16 (f32 rows would double the real ICI traffic vs the model)
        import ml_dtypes

        feats_np = feats_np.astype(ml_dtypes.bfloat16)
    hot_ids = None
    if args.hot_frac > 0:
        from dist_gnn_tpu.cache.builder import build_cache_plan

        parts = np.array_split(arrays["train_idx"], n)
        cap = int(args.hot_frac * N) * (F * 4 + 16) // max(n, 1)
        _, _, hot_ids = build_cache_plan(
            hg, F, parts, fan_out, capacity_bytes=cap, policy="auto",
            hot_dtype="int8" if args.quantize else None,
        )
    store = ShardedFeatureStore(
        feats_np, mesh, axis_name=ax, hot_ids=hot_ids,
        hierarchical=args.two_tier, peer_hot=hot_ids is not None,
        quantize=args.quantize,
    )
    labels_padded = np.zeros((store.shard_size * store.num_shards, 1), np.int32)
    labels_padded[:N, 0] = arrays["labels"]
    labels = jax.device_put(labels_padded, NamedSharding(mesh, P(ax, None)))

    # sampler knobs DERIVED from the graph (cache/autotune) — no hand
    # constants; lossless by construction, overflow counters guard
    from dist_gnn_tpu.cache.autotune import tune_sampler_cost

    scfg, _pred = tune_sampler_cost(
        arrays["indptr"], arrays["indices"], arrays["train_idx"], B, fan_out,
    )
    model = SAGE(F, 256, meta["num_classes"], len(fan_out),
                 compute_dtype=jnp.bfloat16 if on_tpu else None)
    trainer = DistTrainer(
        model=model, fan_out=fan_out, store=store, dedup_last=False,
        sampler_window=scfg.window, sampler_big_budget=scfg.big_row_budget,
        frontier_caps=scfg.frontier_caps,
    )
    state = trainer.init_state(jax.random.key(0))

    world_B = B * n
    train = np.asarray(arrays["train_idx"])
    rng = np.random.default_rng(7)
    U = 4 if on_tpu else 1  # fused sub-steps amortize per-call dispatch
    seed_mat = rng.choice(train, size=(args.steps + 2, U, world_B))
    seeds_all = jnp.asarray(seed_mat.astype(np.int32))
    masks = jnp.ones((U, world_B), bool)
    mask = masks[0]

    # warmup/compile
    state, metrics = trainer.train_step_multi(
        state, graph, labels, seeds_all[0], masks, jax.random.key(1)
    )
    jax.block_until_ready(metrics["loss"])

    if on_tpu:
        from dist_gnn_tpu.utils.timing import measure_chain

        ctr = {"i": 0}

        def one(st):
            s = seeds_all[1 + ctr["i"] % args.steps]
            ctr["i"] += 1
            st, _ = trainer.train_step_multi(
                st, graph, labels, s, masks, jax.random.key(2)
            )
            return st

        dt = measure_chain(one, state, n_lo=3, n_hi=3 + args.steps, reps=2) / U
    else:
        t0 = time.time()
        for i in range(args.steps):
            state, metrics = trainer.train_step_multi(
                state, graph, labels, seeds_all[1 + i], masks, jax.random.key(2)
            )
        jax.block_until_ready(metrics["loss"])
        dt = (time.time() - t0) / args.steps / U

    # ---- volume accounting (host-side replay of one step's sampler) ------
    blocks, bstats = sample_blocks(
        graph, seeds_all[1][0][:B], mask[:B], fan_out, False, jax.random.key(2),
        dedup_last=False, **scfg.sampler_kwargs(),
    )
    edges_per_chip = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks))
    L = int(blocks[-1].frontier.shape[0])
    valid = int(jnp.sum(blocks[-1].frontier_mask))
    remote_frac = (n - 1) / n
    row_bytes = (F + 4) if args.quantize else F * (2 if on_tpu else 4)
    # hit rate over VALID frontier slots only: padding maps to node 0,
    # which is frequently hot (heat-ordered plans), inflating a
    # padded-average rate by up to the pad fraction
    fr_np = np.asarray(blocks[-1].frontier)
    fm_np = np.asarray(blocks[-1].frontier_mask)
    fr_valid = fr_np[fm_np]
    hot_hit = (
        float(np.mean([
            store.hot_hit_rate(fr_valid, c) for c in range(n)
        ]))
        if hot_ids is not None and len(fr_valid) else 0.0
    )
    budget = store.request_budget_for(L)
    peers = (
        mesh.shape[ax[0]] if args.two_tier else n
    )
    exch_bytes_budget = peers * budget * row_bytes  # static upper bound
    # expected actual: hot-tier hits never ride the exchange
    exch_bytes_obs = int(valid * (1 - hot_hit) * remote_frac * row_bytes)
    edges_per_s = edges_per_chip * n / dt

    # ---- predicted scaling from the calibrated cost model ----------------
    cm = CostModel()
    # per-chip single-chip step time: measured here when n==1 would be
    # ideal; use the canonical bench.py number on TPU, the measured dt on CPU
    t1 = 8.39e-3 if on_tpu else dt
    param_bytes = sum(
        int(np.prod(p.shape)) * 4 for p in jax.tree.leaves(state.params)
    )

    def predict(nc: int, t1_: float, rows: int, rb: int) -> float:
        t_ex = rows * (nc - 1) / nc * rb / cm.bandwidth_ici
        t_ps = 2 * param_bytes * (nc - 1) / nc / cm.bandwidth_ici
        return t1_ / (t1_ + t_ex + t_ps)

    predicted = {
        str(nc): round(predict(nc, t1, valid, row_bytes), 4)
        for nc in (2, 4, 8, 16)
    }
    # canonical v5e bench-config prediction (frontier 425984 bf16 rows of
    # 200 B, single-chip step 8.39 ms — BENCH_r03/NOTES), independent of
    # this run's platform: the day-1 multi-chip yardstick
    pred_v5e = {
        str(nc): round(predict(nc, 8.39e-3, 425_984, 200), 4)
        for nc in (2, 4, 8, 16)
    }

    print(json.dumps({
        "metric": "dist_graphsage_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s (aggregate)",
        "vs_baseline": round(
            edges_per_s / (9.72e6 * n), 4
        ),  # per-chip vs the round-1 single-chip yardstick
        "extra": {
            "n_devices": n,
            "mesh": dict(mesh.shape),
            "platform": "tpu" if on_tpu else "cpu-virtual",
            "step_ms": round(dt * 1e3, 3),
            "edges_per_step_per_chip": edges_per_chip,
            "frontier_rows_per_chip": valid,
            "exchange_bytes_per_chip_budget": exch_bytes_budget,
            "exchange_bytes_per_chip_expected": exch_bytes_obs,
            "hot_hit_rate": round(hot_hit, 4),
            "quantized": bool(args.quantize),
            "loss": float(metrics["loss"]),
            "overflow_unserved": int(metrics["overflow"]),
            "sampler_overflow": int(metrics["sampler_overflow"]),
            "predicted_scaling_vs_1chip": predicted,
            "predicted_scaling_v5e_bench_config": pred_v5e,
            "note": (
                "cpu-virtual wall times are not TPU perf; predicted_"
                "scaling uses the calibrated CostModel ICI bandwidth"
            ),
        },
    }))


if __name__ == "__main__":
    main()
