"""Probe: (a) gather flag variants (promise_in_bounds / lax.gather),
(b) misc isolation — fixed-blocks step (gather+model+loss+adam only),
(c) U=4 fused steps honest per-step time.

Run in background; writes /tmp/probe18.log
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


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=N, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device(with_indptr_pairs=True)
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init, iters=16):
        dt = measure_op(fn, init, iters=iters)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7), **KW
    )
    blocks = jax.block_until_ready(blocks)
    inp = blocks[-1]
    safe = jax.block_until_ready(jnp.where(inp.frontier_mask, inp.frontier, 0))

    # (a) gather variants
    def g_plain(c):
        ids = (safe + c) % (N - 1)
        return (c + jnp.sum(features[ids].astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("gather features[ids] (clamp mode)", g_plain, jnp.int32(0))

    def g_pib(c):
        ids = (safe + c) % (N - 1)
        out = jnp.take(features, ids, axis=0, mode="wrap")  # PROMISE_IN_BOUNDS
        return (c + jnp.sum(out.astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("jnp.take wrap (promise-in-bounds)", g_pib, jnp.int32(0))

    def g_sorted(c):
        ids = jnp.sort((safe + c) % (N - 1))
        out = jnp.take(features, ids, axis=0, mode="wrap")
        return (c + jnp.sum(out.astype(jnp.float32)).astype(
            jnp.int32) % 3 + 1) % 97

    bench("sort(425k) + sorted-ids take", g_sorted, jnp.int32(0))

    # (b) fixed-blocks step: everything except sampling
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(
        model=model, fan_out=FAN_OUT, dedup_last=False,
        frontier_caps=KW["frontier_caps"], sampler_window=KW["window"],
        sampler_big_budget=KW["big_row_budget"],
    )
    state = trainer.init_state(jax.random.key(0))
    import optax
    from dist_gnn_tpu.training.trainer import TrainState

    def nostep_sample(st):
        # gather + fwd/bwd + adam with FIXED blocks (sampling excluded);
        # ids depend on st.step so the gather can't be hoisted
        ids = (safe + st.step) % (N - 1)
        feats = features[ids]
        bl = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
            st.params, blocks, feats, bl, mask, jax.random.key(3)
        )
        updates, opt_state = trainer.optimizer.update(grads, st.opt_state,
                                                      st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          step=st.step + 1)

    bench("fixed-blocks step (gather+model+loss+adam)", nostep_sample, state,
          iters=16)

    # (c) U=4 honest
    it2 = gen.epoch(jax.random.key(101))
    b4 = [next(it2) for _ in range(4)]
    sU = jnp.stack([b[0] for b in b4])
    mU = jnp.stack([b[1] for b in b4])
    jax.block_until_ready((sU, mU))

    def fullU4(st):
        st2, _ = trainer.train_step_multi.__wrapped__(
            trainer, st, graph, features, labels, sU, mU, jax.random.key(7)
        )
        return st2

    dt = measure_op(fullU4, state, iters=4)
    print(f"{'FULL U=4 (fori) per sub-step':52s} {dt/4*1e3:8.3f} ms",
          flush=True)

    def fullU2(st):
        st2, _ = trainer.train_step_multi.__wrapped__(
            trainer, st, graph, features, labels, sU[:2], mU[:2],
            jax.random.key(7),
        )
        return st2

    dt = measure_op(fullU2, state, iters=8)
    print(f"{'FULL U=2 (fori) per sub-step':52s} {dt/2*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
