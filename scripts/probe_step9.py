"""Sort vs dense relabel at bench hop shapes + sampling with the per-hop
window heuristic (window_min_slots) + tuned full step.

Run: timeout 1800 python -u scripts/probe_step9.py > /tmp/probe9.log 2>&1
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

from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.ops.relabel import unique_and_relabel, unique_and_relabel_dense
from dist_gnn_tpu.ops.sampling import sample_uniform
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

SAMP_KW = dict(
    dedup_last=False,
    frontier_caps=(3072, 26624, 10**9),
    window=(128, 1024),
    big_row_budget=(5120, 1024),
)
FAN_OUT = (15, 10, 5)


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=3)
        print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # fixed hop inputs
    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7), **SAMP_KW
    )
    blocks = jax.block_until_ready(blocks)
    hop_inputs = [
        (seeds, mask, 5),
        (blocks[0].frontier, blocks[0].frontier_mask, 10),
    ]

    # ---- relabel: sort vs dense at hop shapes ----
    for (s_, m_, k) in hop_inputs:
        s_ = jax.block_until_ready(jnp.where(m_, s_, -1))
        nb = jax.block_until_ready(
            sample_uniform(graph, s_, k, False, jax.random.key(11))
        )

        @jax.jit
        def rl_sort(c, nb=nb, s_=s_):
            ids2 = nb.ids + (c & 0)
            rl = unique_and_relabel(s_, ids2, nb.mask)
            return c + jnp.sum(rl.neigh_slots) + jnp.sum(rl.frontier)

        @jax.jit
        def rl_dense(c, nb=nb, s_=s_):
            ids2 = nb.ids + (c & 0)
            rl = unique_and_relabel_dense(s_, ids2, nb.mask, graph.num_nodes)
            return c + jnp.sum(rl.neigh_slots) + jnp.sum(rl.frontier)

        B = s_.shape[0]
        bench(f"relabel SORT  B={B} k={k}", rl_sort, jnp.int32(0))
        bench(f"relabel DENSE B={B} k={k}", rl_dense, jnp.int32(0))

    # ---- sampling with per-hop window heuristic (fully consumed) ----
    def consume_blocks(blks):
        t = jnp.int32(0)
        for b in blks:
            t = t + jnp.sum(b.frontier) + jnp.sum(b.neigh_slots) + b.num_frontier
        return t

    for wms, mode in [(0, "auto"), (65536, "auto"), (65536, "dense")]:
        @jax.jit
        def samp(c, wms=wms, mode=mode):
            k = jax.random.wrap_key_data(
                jax.random.key_data(jax.random.key(7)) + c.astype(jnp.uint32)
            )
            blks, _ = sample_blocks(
                graph, seeds, mask, FAN_OUT, False, k,
                relabel_mode=mode, window_min_slots=wms, **SAMP_KW,
            )
            return consume_blocks(blks).astype(jnp.uint32)

        bench(f"sample wms={wms} relabel={mode}", samp, jnp.uint32(0))

    # ---- tuned full step ----
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    for wms, mode in [(65536, "auto"), (65536, "dense")]:
        trainer = Trainer(
            model=model, fan_out=FAN_OUT, dedup_last=False,
            frontier_caps=(3072, 26624, 10**9),
            sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
            window_min_slots=wms, relabel_mode=mode,
        )
        state = trainer.init_state(jax.random.key(0))

        def full(st, trainer=trainer):
            st2, _ = trainer.train_step(
                st, graph, features, labels, seeds, mask, jax.random.key(7)
            )
            return st2

        bench(f"FULL tuned wms={wms} relabel={mode}", full, state)


if __name__ == "__main__":
    main()
