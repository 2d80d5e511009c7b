"""Bisect the fused-step overhead: build the bench step up stage by stage.

A: sample_blocks, FULLY consumed (frontier values + slots — no DCE)
B: A + feature gather
C: B + fwd loss
D: B + fwd+bwd (grads consumed)
E: D + adam update  (== full train_step)
F: E with an optimization_barrier on feats
G: E with barriers on feats AND the frontier ids entering the gather

Run: timeout 1800 python -u scripts/probe_step8.py > /tmp/probe8.log 2>&1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
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

    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(model=model, fan_out=FAN_OUT, dedup_last=False)
    state0 = trainer.init_state(jax.random.key(0))

    def bench(name, fn, init):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=3)
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def sample(c):
        k = jax.random.fold_in(jax.random.key(7), 0)
        k = jax.random.wrap_key_data(
            jax.random.key_data(k) + c.astype(jnp.uint32)
        )
        blks, _ = sample_blocks(graph, seeds, mask, FAN_OUT, False, k, **SAMP_KW)
        return blks

    def consume_blocks(blks):
        t = jnp.int32(0)
        for b in blks:
            t = t + jnp.sum(b.frontier) + jnp.sum(b.neigh_slots) + b.num_frontier
        return t

    @jax.jit
    def stage_a(c):
        return consume_blocks(sample(c)).astype(jnp.uint32)

    bench("A sample (fully consumed)", stage_a, jnp.uint32(0))

    def gather(blks):
        inp = blks[-1]
        safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
        return jnp.where(inp.frontier_mask[:, None], features[safe], 0)

    @jax.jit
    def stage_b(c):
        blks = sample(c)
        feats = gather(blks)
        return (jnp.sum(feats.astype(jnp.float32)).astype(jnp.uint32)
                + consume_blocks(blks).astype(jnp.uint32))

    bench("B A + gather", stage_b, jnp.uint32(0))

    def fwd_loss(params, blks, feats, k_drop):
        batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        return trainer._loss_fn(params, blks, feats, batch_labels, mask, k_drop)

    @jax.jit
    def stage_c(c):
        blks = sample(c)
        feats = gather(blks)
        loss, acc = fwd_loss(state0.params, blks, feats, jax.random.key(3))
        return c + loss.astype(jnp.uint32) + jnp.sum(feats[0].astype(jnp.float32)).astype(jnp.uint32)

    bench("C B + fwd loss", stage_c, jnp.uint32(0))

    @jax.jit
    def stage_d(st):
        blks = sample(st.step.astype(jnp.uint32))
        feats = gather(blks)
        (loss, acc), grads = jax.value_and_grad(fwd_loss, has_aux=True)(
            st.params, blks, feats, jax.random.key(3)
        )
        # consume grads without adam
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        params = jax.tree.map(lambda p: p, st.params)
        return type(st)(
            params=params, opt_state=st.opt_state,
            step=st.step + 1 + (gsum * 0).astype(jnp.int32),
        )

    bench("D B + fwd+bwd (no adam)", stage_d, state0)

    @jax.jit
    def stage_e(st):
        blks = sample(st.step.astype(jnp.uint32))
        feats = gather(blks)
        (loss, acc), grads = jax.value_and_grad(fwd_loss, has_aux=True)(
            st.params, blks, feats, jax.random.key(3)
        )
        updates, opt_state = trainer.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("E D + adam (≈ full step)", stage_e, state0)

    @jax.jit
    def stage_f(st):
        blks = sample(st.step.astype(jnp.uint32))
        feats = jax.lax.optimization_barrier(gather(blks))
        (loss, acc), grads = jax.value_and_grad(fwd_loss, has_aux=True)(
            st.params, blks, feats, jax.random.key(3)
        )
        updates, opt_state = trainer.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("F E + feats barrier", stage_f, state0)

    @jax.jit
    def stage_g(st):
        blks = sample(st.step.astype(jnp.uint32))
        inp = blks[-1]
        safe = jax.lax.optimization_barrier(
            jnp.where(inp.frontier_mask, inp.frontier, 0)
        )
        feats = jax.lax.optimization_barrier(
            jnp.where(inp.frontier_mask[:, None], features[safe], 0)
        )
        (loss, acc), grads = jax.value_and_grad(fwd_loss, has_aux=True)(
            st.params, blks, feats, jax.random.key(3)
        )
        updates, opt_state = trainer.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("G E + ids+feats barriers", stage_g, state0)

    # H: fwd-only consumption of the mean-aggregated first layer directly on
    # gathered feats (isolate whether the [S,k,F] mask-mean fusion is the
    # expensive consumer shape)
    @jax.jit
    def stage_h(c):
        blks = sample(c)
        feats = gather(blks)
        b0 = blks[-1]
        B, k = b0.neigh_mask.shape
        nb = feats[b0.num_dst :].reshape(B, k, feats.shape[1])
        m = b0.neigh_mask[..., None].astype(feats.dtype)
        cnt = jnp.sum(b0.neigh_mask, axis=1, dtype=feats.dtype)[:, None]
        h_mean = jnp.sum(nb * m, axis=1) / jnp.maximum(cnt, 1)
        return c + jnp.sum(h_mean.astype(jnp.float32)).astype(jnp.uint32)

    bench("H B + first-layer mask-mean only", stage_h, jnp.uint32(0))


if __name__ == "__main__":
    main()
