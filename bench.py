"""Benchmark: GraphSAGE sample+aggregate+train throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE.json config 2 (GraphSAGE 3-layer, products-like
graph, uniform fanout [15,10,5], single chip, full feature store in HBM).
The metric is end-to-end sampled edges consumed per second through the
fused train step (sampling + relabel + feature gather + fwd/bwd + Adam).

``vs_baseline`` = cumulative speedup over this framework's first honest
round-1 measurement (see REF_EDGES_PER_S below); the reference publishes
no numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Baseline: the reference publishes no numbers (BASELINE.md), so the fixed
# yardstick is this framework's FIRST honest measurement of this exact
# config (round 1, naive elementwise pipeline, tunnel-proof timing):
# 9.72M edges/s per chip.  vs_baseline therefore reads as cumulative
# speedup over the framework's own starting point under identical
# methodology.
REF_EDGES_PER_S = 9.72e6


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from dist_gnn_tpu.dataloading import SeedGenerator
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import SAGE
    from dist_gnn_tpu.training import Trainer

    # products-like synthetic: 500k nodes, avg degree 30, 100-dim features
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000,
        avg_degree=30,
        feature_dim=100,
        num_classes=47,
        train_frac=0.2,
        seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    # indptr_pairs: one-row-gather extents (+8 B/node HBM, ~0.5 ms/step);
    # window_pair: one-row L1 window fetch (+4 B/edge HBM, ~0.2 ms/step)
    graph = hg.to_device(with_indptr_pairs=True, window_pair=(128, 1024))
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])

    fan_out = (15, 10, 5)
    batch = 512
    features = features.astype(jnp.bfloat16)  # halves gather traffic
    model = SAGE(
        features.shape[1],
        256,
        meta["num_classes"],
        len(fan_out),
        compute_dtype=jnp.bfloat16,
    )
    # frontier budget on the middle hop only (the final hop runs dedup-free);
    # window=128 enables the 2-row windowed edge gather (3x sampling speedup,
    # exact — see ops/sampling._window_fetch)
    # Tuned knobs (scripts/probe_step4.py, all LOSSLESS — asserted below):
    # * two-level window cascade: deg<=~128 rows from the narrow window,
    #   hub rows (<=1024) from a wide second window, the ~500 deg>1024
    #   hubs exactly elementwise under budget 1024;
    # * hop-2 frontier cap 26624 (observed valid max ~25.5k of 33792):
    #   trims the padded last-hop frontier 540672 -> 425984 rows, cutting
    #   the dominant feature gather ~21% with zero frontier drops.
    trainer = Trainer(
        model=model,
        fan_out=fan_out,
        frontier_caps=(3072, 26624, 10**9),
        dedup_last=False,
        sampler_window=(128, 1024),
        sampler_big_budget=(5120, 1024),
        # gather_group left 0: every Pallas gather loses to XLA's take on
        # this chip (measured — see ops/gather_pallas.py module docstring)
    )
    state = trainer.init_state(jax.random.key(0))

    gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True, drop_last=True)
    from dist_gnn_tpu.utils.timing import device_sync, measure_chain

    # fixed seed batches (pre-staged so the chain measures the train step,
    # not host-side batch slicing)
    batches = []
    it = gen.epoch(jax.random.key(100))
    for _ in range(8):
        batches.append(next(it))
    for s, mk in batches:
        jax.block_until_ready((s, mk))

    # U=8 fused steps (train_step_multi): identical math to 8 sequential
    # Adam steps, but one program — amortizes the ~1.5 ms/call tunnel
    # dispatch AND lets XLA overlap/schedule across sub-steps
    # (probe_step19 fori: U=1 9.56, U=2 8.65, U=4 8.41, U=8 8.20 ms/step).
    UNROLL = 8
    pair_seeds = [
        (
            jnp.stack([b[0] for b in batches[i : i + UNROLL]]),
            jnp.stack([b[1] for b in batches[i : i + UNROLL]]),
        )
        for i in range(0, len(batches), UNROLL)
    ]
    jax.block_until_ready(pair_seeds)
    step_counter = {"i": 0}

    def one_step(state):
        sU, mkU = pair_seeds[step_counter["i"] % len(pair_seeds)]
        step_counter["i"] += 1
        state, m = trainer.train_step_multi(
            state, graph, features, labels, sU, mkU, jax.random.key(7)
        )
        return state

    # tunnel-RTT-corrected per-step time (block_until_ready lies on the
    # tunneled backend — see utils/timing.py)
    dt_step = measure_chain(one_step, state, n_lo=4, n_hi=16, reps=3) / UNROLL

    # one more step for final metrics
    state, m = trainer.train_step(
        state, graph, features, labels, batches[0][0], batches[0][1], jax.random.key(7)
    )
    device_sync(m["loss"])
    n_steps, dt = 1, dt_step

    # sampled edges per step: sum over layers of (layer seed capacity * k),
    # counting the real (mask-valid) sampled edges via one extra traced step
    # is unnecessary — use the expected count from capacities * fill rate.
    # We report REAL edges: re-run one step's sampler and count valid slots.
    from dist_gnn_tpu.sampler import sample_blocks

    seeds, mask = next(gen.epoch(jax.random.key(101)))
    blocks, stats = sample_blocks(
        graph, seeds, mask, fan_out, False, jax.random.key(7),
        dedup_last=False, window=(128, 1024), big_row_budget=(5120, 1024),
        frontier_caps=(3072, 26624, 10**9),
    )
    assert int(stats["sampler_overflow"]) == 0, (
        f"big-row budget overflowed: {int(stats['sampler_overflow'])} slots"
    )
    assert int(stats["frontier_overflow"]) == 0, (
        f"frontier cap dropped {int(stats['frontier_overflow'])} entries"
    )
    edges_per_step = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks))
    # fidelity check: the windowed sampler must not drop edges vs exact
    blocks_exact, _ = sample_blocks(
        graph, seeds, mask, fan_out, False, jax.random.key(7), dedup_last=False
    )
    edges_exact = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks_exact))
    assert edges_per_step == edges_exact, (
        f"windowed sampler dropped edges: {edges_per_step} vs {edges_exact}"
    )

    edges_per_s = edges_per_step * n_steps / dt

    # ---- secondary metrics: biased (alias) sampling and GAT (driver
    # configs 3/5 analogs; same methodology, fewer chain reps) -----------
    def measure_secondary(trainer_x, graph_x, feats_x, samp_kwargs):
        state_x = trainer_x.init_state(jax.random.key(0))
        ctr = {"i": 0}

        def one(s_):
            sU, mkU = pair_seeds[ctr["i"] % len(pair_seeds)]
            ctr["i"] += 1
            s2, _ = trainer_x.train_step_multi(
                s_, graph_x, feats_x, labels, sU, mkU, jax.random.key(7)
            )
            return s2

        dt_x = measure_chain(one, state_x, n_lo=3, n_hi=9, reps=2) / UNROLL
        blocks_x, _ = sample_blocks(
            graph_x, seeds, mask, fan_out, False, jax.random.key(7),
            dedup_last=False, **samp_kwargs,
        )
        e_x = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks_x))
        return e_x / dt_x

    extras = {}
    try:
        import numpy as _np

        from dist_gnn_tpu.dataloading.preprocess import add_random_probs
        from dist_gnn_tpu.models import GAT

        hg_b = HostGraph(
            indptr=arrays["indptr"], indices=arrays["indices"],
            probs=add_random_probs(int(meta["num_edges"])),
        )
        graph_b = hg_b.to_device(
            with_alias=True, with_indptr_pairs=True, window_pair=(128, 1024)
        )
        trainer_b = Trainer(
            model=model, fan_out=fan_out, dedup_last=False,
            frontier_caps=(3072, 26624, 10**9),
            sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
        )
        extras["bias_alias_edges_per_s"] = round(
            measure_secondary(
                trainer_b, graph_b, features,
                dict(window=(128, 1024), big_row_budget=(5120, 1024),
                     frontier_caps=(3072, 26624, 10**9)),
            ),
            1,
        )
    except Exception as e:  # noqa: BLE001 — secondary metrics never break the bench
        extras["bias_alias_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        gat = GAT(
            features.shape[1], 128, meta["num_classes"], len(fan_out),
            num_heads=4, compute_dtype=jnp.bfloat16,
        )
        trainer_g = Trainer(
            model=gat, fan_out=fan_out, dedup_last=False,
            frontier_caps=(3072, 26624, 10**9),
            sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
        )
        extras["gat_edges_per_s"] = round(
            measure_secondary(
                trainer_g, graph, features,
                dict(window=(128, 1024), big_row_budget=(5120, 1024),
                     frontier_caps=(3072, 26624, 10**9)),
            ),
            1,
        )
    except Exception as e:  # noqa: BLE001
        extras["gat_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # serving metric: full-graph layer-wise inference (all N nodes,
        # full neighborhoods — the reference's models.py:57-97 analog),
        # steady state (second call; executables cached).  Wall time
        # includes the host chunk loop's dispatches — what a serving
        # deployment actually pays.
        from dist_gnn_tpu.models.inference import full_graph_inference

        for rep in range(2):
            t0 = time.time()
            logits = full_graph_inference(model, state.params, hg, features)
            device_sync(logits)
            dt_inf = time.time() - t0
        extras["inference_edges_per_s"] = round(
            len(fan_out) * int(meta["num_edges"]) / dt_inf, 1
        )
        # GAT serving (attention over FULL neighborhoods, online softmax)
        gat_p = gat.init(jax.random.key(1))
        for rep in range(2):
            t0 = time.time()
            lg = full_graph_inference(gat, gat_p, hg, features)
            device_sync(lg)
            dt_g = time.time() - t0
        extras["inference_gat_edges_per_s"] = round(
            len(fan_out) * int(meta["num_edges"]) / dt_g, 1
        )
    except Exception as e:  # noqa: BLE001
        extras["inference_error"] = f"{type(e).__name__}: {e}"[:200]

    result = {
        "metric": "graphsage_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 4),
        "extra": {
            "steps_per_s": round(n_steps / dt, 3),
            "edges_per_step": edges_per_step,
            "batch": batch,
            "fan_out": list(fan_out),
            "loss": float(m["loss"]),
            "device": str(jax.devices()[0]),
            **extras,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
