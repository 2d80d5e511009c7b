"""Probe: (a) top_k cost at gumbel-window shapes, (b) gumbel level parts,
(c) GAT fixed-blocks step after the einsum fix, (d) bias sample_blocks
with the biased-hops-always-window gate.

Run in background; writes /tmp/probe22.log
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
from dist_gnn_tpu.models import GAT
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
    rng = np.random.default_rng(0)

    def bench(name, fn, init, iters=16, args=()):
        dt = measure_op(fn, init, iters=iters, args=args)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # (a) top_k isolated
    for B, Wd in ((26624, 256), (5120, 2048), (3072, 256)):
        g = jnp.asarray(rng.standard_normal((B, Wd)).astype(np.float32))

        def tk(c, g=g):
            gg = g + (c & 0).astype(jnp.float32)
            v, p = jax.lax.top_k(gg, 15)
            return (c + (jnp.sum(v) + jnp.sum(p).astype(jnp.float32)).astype(
                jnp.int32) % 3 + 1) % 97

        bench(f"lax.top_k [{B},{Wd}] k=15", tk, jnp.int32(0))

    # one-hot hit select at the two level shapes
    for B, Wd in ((26624, 256), (5120, 2048)):
        wids = jnp.asarray(rng.integers(0, N, (B, Wd), dtype=np.int32))
        pos = jnp.asarray(rng.integers(0, Wd, (B, 15), dtype=np.int32))

        def hs(c, wids=wids, pos=pos, Wd=Wd):
            pp = (pos + c) % Wd
            col = jax.lax.broadcasted_iota(jnp.int32, (pp.shape[0], Wd), 1)
            hit = col[:, None, :] == pp[:, :, None]
            ids = jnp.sum(jnp.where(hit, wids[:, None, :], 0), axis=2)
            return (c + jnp.sum(ids) % 3 + 1) % 97

        bench(f"one-hot select [{B},15,{Wd}]", hs, jnp.int32(0))

    # (b) bias sample_blocks after the always-window gate
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

    def samp_b(c, graph):
        s = jnp.where(mask, (seeds + c) % (N - 1), seeds)
        blocks, stats = sample_blocks(
            graph, s, mask, FAN_OUT, False, jax.random.key(7),
            dedup_last=False, frontier_caps=CAPS, window=WIN,
            big_row_budget=BUD,
        )
        return (c + (tree_consume(blocks) + tree_consume(stats)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("BIAS sample_blocks (all-window gate)", samp_b, jnp.int32(0),
          args=(graph,))

    # (c) GAT fixed-blocks after einsum fix
    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7),
        dedup_last=False, frontier_caps=CAPS, window=WIN, big_row_budget=BUD,
    )
    blocks = jax.block_until_ready(blocks)
    inp = blocks[-1]
    safe = jax.block_until_ready(jnp.where(inp.frontier_mask, inp.frontier, 0))

    gat = GAT(100, 128, meta["num_classes"], 3, num_heads=4,
              compute_dtype=jnp.bfloat16)
    tr_g = Trainer(model=gat, fan_out=FAN_OUT, dedup_last=False,
                   frontier_caps=CAPS, sampler_window=WIN,
                   sampler_big_budget=BUD)
    st_g = tr_g.init_state(jax.random.key(0))
    import optax
    from dist_gnn_tpu.training.trainer import TrainState

    def gat_model(st, features):
        ids = (safe + st.step) % (N - 1)
        feats = features[ids]
        bl = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(tr_g._loss_fn, has_aux=True)(
            st.params, blocks, feats, bl, mask, jax.random.key(3)
        )
        updates, opt_state = tr_g.optimizer.update(grads, st.opt_state,
                                                   st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=st.step + 1)

    bench("GAT gather+model+loss+adam (einsum)", gat_model, st_g, iters=8,
          args=(features,))

    # GAT forward only
    def gat_fwd(c, features):
        ids = (safe + c) % (N - 1)
        feats = features[ids]
        logits = gat.apply(
            st_g.params, tuple(reversed(blocks)), feats, train=False,
            contiguous_first=True,
        )
        return (c + jnp.sum(logits.astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("GAT gather+forward only", gat_fwd, jnp.int32(0), args=(features,))


if __name__ == "__main__":
    main()
