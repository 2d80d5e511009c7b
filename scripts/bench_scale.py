"""papers100M-regime scale smoke on ONE chip: train-step time must be
graph-SIZE independent.

The reference's headline capability is mini-batch GraphSAGE on
ogbn-papers100M-class graphs (``/root/reference/example/graphsage/README.md:3-7``)
— huge graph, small sampled batch, so per-step cost is set by the sampled
frontier, not |V| or |E|.  This script proves the same property for this
framework on real TPU hardware at the largest size that fits one v5e
chip's HBM: a 10M-node / ~300M-edge (symmetrized) power-law graph —
20x the 500k/30M bench graph — with the SAME batch/fanout config as
``bench.py``.  Design claim under test: every per-step structure
(Feistel draws, window fetches, relabel, feature gather) is sized by the
frontier; graph size only enters through HBM residency and the tuner's
degree-distribution simulation.

Usage:  python scripts/bench_scale.py [num_nodes] [avg_degree]
Prints one JSON line {scale_nodes, scale_edges, step_ms, edges_per_s,
ref_500k_step_ms_hint}.

Backs the NOTES.md round-5 entry "scale smoke".  Run AFTER bench.py (not
concurrently — the shared chip makes co-running numbers meaningless).
"""

import json
import sys
import time

import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from dist_gnn_tpu.cache.autotune import tune_sampler_cost
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain


def main():
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    avg_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    t0 = time.time()
    arrays, meta = make_synthetic_dataset(
        num_nodes=num_nodes,
        avg_degree=avg_degree,
        feature_dim=100,
        num_classes=47,
        train_frac=0.05,
        seed=0,
    )
    print(f"# synth {num_nodes} nodes / {meta['num_edges']} edges "
          f"in {time.time()-t0:.0f}s", flush=True)
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    fan_out = (15, 10, 5)
    batch = 512

    cfg, pred_ms = tune_sampler_cost(
        arrays["indptr"], arrays["indices"], arrays["train_idx"], batch, fan_out
    )
    knobs = cfg.sampler_kwargs()
    print(f"# tuned knobs {cfg.window} {cfg.big_row_budget} "
          f"caps {cfg.frontier_caps} pred {pred_ms:.2f} ms", flush=True)

    t0 = time.time()
    graph = hg.to_device(with_indptr_pairs=True, window_pair=cfg.window)
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    jax.block_until_ready(features)
    print(f"# H2D upload in {time.time()-t0:.0f}s", flush=True)

    model = SAGE(100, 256, meta["num_classes"], len(fan_out),
                 compute_dtype=jnp.bfloat16)
    trainer = Trainer(model=model, fan_out=fan_out, dedup_last=False,
                      **cfg.trainer_kwargs())
    state = trainer.init_state(jax.random.key(0))

    gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True,
                        drop_last=True)
    batches = []
    ep = 0
    while len(batches) < 8:  # small graphs: cycle epochs to fill the unroll
        for b in gen.epoch(jax.random.key(100 + ep)):
            batches.append(b)
            if len(batches) == 8:
                break
        ep += 1
    UNROLL = 8
    sU = jnp.stack([b[0] for b in batches])
    mkU = jnp.stack([b[1] for b in batches])
    jax.block_until_ready((sU, mkU))

    ctr = {"i": 0}

    def one_step(state):
        ctr["i"] += 1
        state, _ = trainer.train_step_multi(
            state, graph, features, labels, sU, mkU, jax.random.key(7)
        )
        return state

    dt_step = measure_chain(one_step, state, n_lo=4, n_hi=16, reps=3) / UNROLL

    seeds, mask = batches[0]
    blocks, stats = sample_blocks(
        graph, seeds, mask, fan_out, False, jax.random.key(7),
        dedup_last=False, **knobs,
    )
    assert int(stats["sampler_overflow"]) == 0
    assert int(stats["frontier_overflow"]) == 0
    edges_per_step = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks))

    print(json.dumps({
        "metric": "scale_smoke_train_edges_per_s",
        "scale_nodes": num_nodes,
        "scale_edges": int(meta["num_edges"]),
        "step_ms": round(dt_step * 1e3, 3),
        "edges_per_step": edges_per_step,
        "edges_per_s": round(edges_per_step / dt_step, 1),
        "sampler_knobs": {"window": list(cfg.window),
                          "big_row_budget": list(cfg.big_row_budget)},
        "note": "compare step_ms with bench.py's phase_ms.step on the "
                "500k-node graph — size-independence is the claim",
    }), flush=True)


if __name__ == "__main__":
    main()
