"""Probe 28b: just the tail stages of probe_step28 (full window fetch,
full windowed sample_uniform, exact elementwise reference).

Run in background; writes /tmp/probe28b2.log
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

from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.ops import prng
from dist_gnn_tpu.ops.sampling import _row_extents, _window_fetch, sample_uniform
from dist_gnn_tpu.utils.timing import measure_op

N = 500_000
B, K = 26624, 15
W = (128, 1024)
R = (5120, 1024)


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
    graph = hg.to_device(with_indptr_pairs=True, window_pair=128)
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    jax.block_until_ready(seeds)
    key = jax.random.key(11)

    def bench(name, fn, init=jnp.int32(0), iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:48s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    start, deg, valid = _row_extents(graph, seeds)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    row_key = prng.random_keys(key, (B,))
    perm = prng.feistel_permutation(j, deg[:, None], row_key[:, None])
    sel = jnp.where(deg[:, None] <= K, j, perm)
    mask = valid[:, None] & (j < jnp.minimum(deg[:, None], K))
    start, sel, mask = jax.block_until_ready((start, sel, mask))

    def f_fetch(c, graph, start, sel, mask):
        st = start + (c % 2)
        out = _window_fetch(graph, st, sel, mask, W, R)
        return (c + consume(out).astype(jnp.int32) % 3 + 1) % 97

    bench("full _window_fetch (L1+L2+exact tail)", f_fetch,
          args=(graph, start, sel, mask))

    def f_full(c, graph):
        s = (seeds + c) % (N - 1)
        nb = sample_uniform(graph, s, K, False, key, window=W,
                            big_row_budget=R)
        return (c + consume(tuple(nb)).astype(jnp.int32) % 3 + 1) % 97

    bench("sample_uniform windowed (full)", f_full, args=(graph,))

    def f_exact(c, graph):
        s = (seeds + c) % (N - 1)
        nb = sample_uniform(graph, s, K, False, key)
        return (c + consume((nb.ids, nb.mask)).astype(jnp.int32) % 3 + 1) % 97

    bench("sample_uniform elementwise (ref)", f_exact, args=(graph,))


if __name__ == "__main__":
    main()
