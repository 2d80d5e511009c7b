"""Probe: L2 hub-window fetch after (a) pre-padded edge arrays (no more
whole-array concat per level) and (b) the W2 pair layout (one-row hub
windows).  Then the full windowed hop-3 sample and the full fused step.

Run in background; writes /tmp/probe31.log
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
from dist_gnn_tpu.ops import prng
from dist_gnn_tpu.ops.sampling import (
    _compact_rows,
    _row_extents,
    _window_select_multi,
    sample_uniform,
)
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_op

N = 500_000
B, K = 26624, 15
W1, W2 = 128, 1024
R1, R2 = 5120, 1024


def consume(tree):
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
    graph = hg.to_device(with_indptr_pairs=True, window_pair=(W1, W2))
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    key = jax.random.key(11)

    start, deg, valid = _row_extents(graph, seeds)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    row_key = prng.random_keys(key, (B,))
    perm = prng.feistel_permutation(j, deg[:, None], row_key[:, None])
    sel = jnp.where(deg[:, None] <= K, j, perm)
    mask = valid[:, None] & (j < jnp.minimum(deg[:, None], K))
    _, covered = _window_select_multi(
        (graph.indices,), graph.num_edges, start, sel, mask, W1,
        pairs=((graph.win_pair, graph.win_pair_rows_a),),
    )
    unc = jnp.any(mask & ~covered, axis=1)
    big_start, big_sel, big_mask, inv_row, _ = _compact_rows(
        start, sel, mask, unc, R1
    )
    big_start, big_sel, big_mask = jax.block_until_ready(
        (big_start, big_sel, big_mask)
    )

    def bench(name, fn, init=jnp.int32(0), iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def f_l2_pad(c, graph, big_start, big_sel, big_mask):
        st = big_start + (c % 2)
        vals2, cov2 = _window_select_multi(
            (graph.indices,), graph.num_edges, st, big_sel, big_mask, W2
        )
        return (c + consume((vals2, cov2)).astype(jnp.int32) % 3 + 1) % 97

    bench("a) L2 select, padded arrays (2-row)", f_l2_pad,
          args=(graph, big_start, big_sel, big_mask))

    def f_l2_pair(c, graph, big_start, big_sel, big_mask):
        st = big_start + (c % 2)
        vals2, cov2 = _window_select_multi(
            (graph.indices,), graph.num_edges, st, big_sel, big_mask, W2,
            pairs=((graph.win_pair2, graph.win_pair2_rows_a),),
        )
        return (c + consume((vals2, cov2)).astype(jnp.int32) % 3 + 1) % 97

    bench("b) L2 select, W2 pair layout (1-row)", f_l2_pair,
          args=(graph, big_start, big_sel, big_mask))

    def f_full(c, graph):
        s = (seeds + c) % (N - 1)
        nb = sample_uniform(graph, s, K, False, key, window=(W1, W2),
                            big_row_budget=(R1, R2))
        return (c + consume(tuple(nb)).astype(jnp.int32) % 3 + 1) % 97

    bench("c) sample_uniform windowed (pads+pair2)", f_full, args=(graph,))

    # full fused step at bench config
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(
        model=model, fan_out=(15, 10, 5), dedup_last=False,
        frontier_caps=(3072, 26624, 10**9), sampler_window=(W1, W2),
        sampler_big_budget=(R1, R2),
    )
    state = trainer.init_state(jax.random.key(0))
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    it2 = gen.epoch(jax.random.key(101))
    b8 = [next(it2) for _ in range(8)]
    sU = jnp.stack([b[0] for b in b8])
    mU = jnp.stack([b[1] for b in b8])
    jax.block_until_ready((sU, mU))

    def fullU(st, graph, features):
        st2, _ = trainer.train_step_multi.__wrapped__(
            trainer, st, graph, features, labels, sU, mU, jax.random.key(7)
        )
        return st2

    dt = measure_op(fullU, state, iters=2, args=(graph, features))
    print(f"{'d) FULL U=8 per sub-step (pads+pair2)':52s} {dt/8*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
