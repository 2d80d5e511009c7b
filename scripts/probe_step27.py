"""Probe (round 2 cont.): current-step anatomy + deeper U scan.

Phases at the bench config, honest (measure_op device-side loops):
  a. sample_blocks (all 3 hops, windowed cascade, consumed)
  b. final-hop feature gather [26624*16 rows, bf16]
  c. full fused step per sub-step at U = 8 / 16 / 24

Run in background; writes /tmp/probe27.log
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
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_op

FAN_OUT = (15, 10, 5)
KW = dict(
    dedup_last=False,
    frontier_caps=(3072, 26624, 10**9),
    window=(128, 1024),
    big_row_budget=(5120, 1024),
)
N = 500_000


def tree_consume(tree):
    tot = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=N, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device(with_indptr_pairs=True, window_pair=128)
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init, iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def samp(c, graph):
        s = jnp.where(mask, (seeds + c) % (N - 1), seeds)
        blocks, stats = sample_blocks(
            graph, s, mask, FAN_OUT, False, jax.random.key(7), **KW
        )
        return (c + (tree_consume(blocks) + tree_consume(stats)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("sample_blocks (consumed)", samp, jnp.int32(0), args=(graph,))

    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7), **KW
    )
    inp = jax.block_until_ready(blocks[-1])
    rows = jax.block_until_ready(jnp.where(inp.frontier_mask, inp.frontier, 0))
    print("final-hop rows:", rows.shape, flush=True)

    def gather(c, features):
        r = (rows + c) % (N - 1)
        return (c + jnp.sum(features[r].astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("final-hop feature gather", gather, jnp.int32(0), args=(features,))

    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(
        model=model, fan_out=FAN_OUT, dedup_last=False,
        frontier_caps=KW["frontier_caps"], sampler_window=KW["window"],
        sampler_big_budget=KW["big_row_budget"],
    )
    state = trainer.init_state(jax.random.key(0))

    it2 = gen.epoch(jax.random.key(101))
    b24 = [next(it2) for _ in range(24)]
    for U, iters in ((8, 3), (16, 2), (24, 1)):
        sU = jnp.stack([b[0] for b in b24[:U]])
        mU = jnp.stack([b[1] for b in b24[:U]])
        jax.block_until_ready((sU, mU))

        def fullU(st, graph, features, sU=sU, mU=mU):
            st2, _ = trainer.train_step_multi.__wrapped__(
                trainer, st, graph, features, labels, sU, mU,
                jax.random.key(7),
            )
            return st2

        dt = measure_op(fullU, state, iters=iters, args=(graph, features))
        print(f"{'FULL U=%d (fori) per sub-step' % U:52s} {dt/U*1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
