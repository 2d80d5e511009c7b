"""Probe: dissect the L2 hub cascade of _window_fetch at real bench-graph
hop-3 data (R1=5120 compacted rows, W2=1024, R2=1024).

Stages (all on the REAL compacted rows from one hop-3 batch):
  a. L2 window select alone ([5120] rows, 2*1024 window)
  b. L3 compact + exact elementwise tail + scatter-back to R1
  c. final scatter-back R1 -> 26624 + merges (full fetch minus L1 stage)

Run in background; writes /tmp/probe30.log
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
from dist_gnn_tpu.ops.sampling import (
    _compact_rows,
    _row_extents,
    _scatter_back_vals,
    _window_select_multi,
)
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
    graph = hg.to_device(with_indptr_pairs=True, window_pair=128)
    rng = np.random.default_rng(0)
    seeds = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    key = jax.random.key(11)

    start, deg, valid = _row_extents(graph, seeds)
    j = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    row_key = prng.random_keys(key, (B,))
    perm = prng.feistel_permutation(j, deg[:, None], row_key[:, None])
    sel = jnp.where(deg[:, None] <= K, j, perm)
    mask = valid[:, None] & (j < jnp.minimum(deg[:, None], K))

    # L1 pass once to get the real compacted hub rows
    _, covered = _window_select_multi(
        (graph.indices,), graph.num_edges, start, sel, mask, W1,
        pairs=((graph.win_pair, graph.win_pair_rows_a),),
    )
    unc = jnp.any(mask & ~covered, axis=1)
    big_start, big_sel, big_mask, inv_row, _ = _compact_rows(
        start, sel, mask, unc, R1
    )
    big_start, big_sel, big_mask, inv_row = jax.block_until_ready(
        (big_start, big_sel, big_mask, inv_row)
    )
    print("real hub rows:", int(jnp.sum(unc)), "of", B, flush=True)

    def bench(name, fn, init=jnp.int32(0), iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def f_l2(c, graph, big_start, big_sel, big_mask):
        st = big_start + (c % 2)
        vals2, cov2 = _window_select_multi(
            (graph.indices,), graph.num_edges, st, big_sel, big_mask, W2
        )
        return (c + consume((vals2, cov2)).astype(jnp.int32) % 3 + 1) % 97

    bench("a) L2 window select [5120] W2=1024", f_l2,
          args=(graph, big_start, big_sel, big_mask))

    def f_l3(c, graph, big_start, big_sel, big_mask):
        st = big_start + (c % 2)
        vals2, cov2 = _window_select_multi(
            (graph.indices,), graph.num_edges, st, big_sel, big_mask, W2
        )
        unc2 = jnp.any(big_mask & ~cov2, axis=1)
        b2_start, b2_sel, b2_mask, inv2, _ = _compact_rows(
            st, big_sel, big_mask, unc2, R2
        )
        nnz = graph.num_edges - 1
        b2_pos = jnp.clip(b2_start[:, None] + b2_sel.astype(st.dtype), 0, nnz)
        b3 = graph.indices[b2_pos]
        vals3, served3 = _scatter_back_vals((b3,), b2_mask, inv2, R1)
        sub = jnp.where(cov2, vals2[0], vals3[0])
        return (c + consume((sub, served3)).astype(jnp.int32) % 3 + 1) % 97

    bench("b) L2 + L3 tail + scatter-back", f_l3,
          args=(graph, big_start, big_sel, big_mask))

    def f_back(c, big_mask, inv_row):
        vals_sub = (big_sel + c,)
        outs, served = _scatter_back_vals(vals_sub, big_mask, inv_row, B)
        return (c + consume((outs, served)).astype(jnp.int32) % 3 + 1) % 97

    bench("c) final scatter-back R1->B", f_back,
          args=(big_mask, inv_row))


if __name__ == "__main__":
    main()
