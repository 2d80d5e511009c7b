"""Probe: windowed-Gumbel biased sampler vs the alias per-draw path,
plus the full bias bench step.

Run in background; writes /tmp/probe21.log
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
from dist_gnn_tpu.dataloading.preprocess import (add_random_probs,
                                                 make_synthetic_dataset)
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.ops.sampling import sample_biased_windowed
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_op

FAN_OUT = (15, 10, 5)
CAPS = (3072, 26624, 10**9)
WIN = (128, 1024)
BUD = (5120, 1024)
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
    hg = HostGraph(
        indptr=arrays["indptr"], indices=arrays["indices"],
        probs=add_random_probs(int(meta["num_edges"])),
    )
    graph = hg.to_device(with_alias=True, with_indptr_pairs=True,
                         window_pair=128)
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init, iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7),
        dedup_last=False, frontier_caps=CAPS, window=WIN, big_row_budget=BUD,
    )
    blocks = jax.block_until_ready(blocks)
    s3 = jax.block_until_ready(
        jnp.where(blocks[1].frontier_mask, blocks[1].frontier, 0)
    )

    # overflow check across keys
    ovf = 0
    for t in range(4):
        nb = sample_biased_windowed(
            graph, s3, 15, jax.random.key(100 + t), window=WIN,
            big_row_budget=BUD,
        )
        ovf += int(nb.overflow)
    print(f"hop3 gumbel-windowed overflow over 4 keys: {ovf}", flush=True)

    def hop3_g(c, graph):
        s = (s3 + c) % (N - 1)
        nb = sample_biased_windowed(
            graph, s, 15, jax.random.key(11), window=WIN, big_row_budget=BUD,
        )
        return (c + tree_consume((nb.ids, nb.mask)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("hop3 gumbel-windowed [26624x15]", hop3_g, jnp.int32(0),
          args=(graph,))

    def samp_b(c, graph):
        s = jnp.where(mask, (seeds + c) % (N - 1), seeds)
        blocks, stats = sample_blocks(
            graph, s, mask, FAN_OUT, False, jax.random.key(7),
            dedup_last=False, frontier_caps=CAPS, window=WIN,
            big_row_budget=BUD,
        )
        return (c + (tree_consume(blocks) + tree_consume(stats)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("BIAS sample_blocks (consumed)", samp_b, jnp.int32(0),
          args=(graph,))

    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(model=model, fan_out=FAN_OUT, dedup_last=False,
                      frontier_caps=CAPS, sampler_window=WIN,
                      sampler_big_budget=BUD)
    state = trainer.init_state(jax.random.key(0))
    it2 = gen.epoch(jax.random.key(101))
    b4 = [next(it2) for _ in range(4)]
    sU = jnp.stack([b[0] for b in b4])
    mU = jnp.stack([b[1] for b in b4])
    jax.block_until_ready((sU, mU))

    def fullU(st, graph, features):
        st2, _ = trainer.train_step_multi.__wrapped__(
            trainer, st, graph, features, labels, sU, mU, jax.random.key(7)
        )
        return st2

    dt = measure_op(fullU, state, iters=4, args=(graph, features))
    print(f"{'BIAS FULL U=4 per sub-step':52s} {dt/4*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
