"""Probe: cross-step overlap via unrolled multi-batch train steps.

Sampling is VPU/select-bound (~5.5 ms honest) while the final feature
gather is DMA-bound (~4.25 ms).  Within one step they are dependent, but
across steps they are not: unrolling 2+ steps into one jitted program may
let XLA hide batch B's gather DMA under batch A's sampling compute.

Also probes batch=1024 (fixed-cost amortization) and an interleaved
manual schedule (all samples first, then all gathers, then models).

Run: timeout 1800 python -u scripts/probe_step11.py > /tmp/probe11.log 2>&1
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
from dist_gnn_tpu.utils.timing import measure_chain

FAN_OUT = (15, 10, 5)
KW = dict(
    frontier_caps=(3072, 26624, 10**9),
    dedup_last=False,
    sampler_window=(128, 1024),
    sampler_big_budget=(5120, 1024),
)


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
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(model=model, fan_out=FAN_OUT, **KW)
    state = trainer.init_state(jax.random.key(0))

    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    batches = []
    it = gen.epoch(jax.random.key(100))
    for _ in range(8):
        batches.append(next(it))
    jax.block_until_ready(batches)

    def bench(name, fn, init, per=1):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=3)
        e = 413_936
        print(f"{name:44s} {dt*1e3:8.3f} ms  -> {dt/per*1e3:7.3f} ms/step "
              f"{e/(dt/per)/1e6:6.1f} M edges/s", flush=True)
        return dt / per

    # baseline single step
    ctr = {"i": 0}

    def one(st):
        s, mk = batches[ctr["i"] % 8]
        ctr["i"] += 1
        st2, _ = trainer.train_step(st, graph, features, labels, s, mk,
                                    jax.random.key(7))
        return st2

    bench("single step (baseline)", one, state)

    # unrolled U steps in one jit
    for U in (2, 4):
        @jax.jit
        def unrolled(st, U=U):
            for u in range(U):
                s, mk = batches[u]
                st, _ = trainer.train_step.__wrapped__(
                    trainer, st, graph, features, labels, s, mk,
                    jax.random.key(11 + u),
                )
            return st

        bench(f"unroll x{U} (sequential dep on state)", unrolled, state, per=U)

    # unrolled with INDEPENDENT subgraphs: one param set, grads summed at
    # the end (microbatch accumulation) — removes the state dependency
    # between the U sub-steps so XLA can interleave freely.
    for U in (2, 4):
        @jax.jit
        def microbatch(st, U=U):
            import optax
            gsum = None
            loss_t = 0.0
            for u in range(U):
                s, mk = batches[u]
                k_s, k_d = jax.random.split(
                    jax.random.fold_in(jax.random.key(23), u)
                )
                blocks, _ = sample_blocks(
                    graph, s, mk, FAN_OUT, False, k_s,
                    dedup_last=False, frontier_caps=KW["frontier_caps"],
                    window=KW["sampler_window"],
                    big_row_budget=KW["sampler_big_budget"],
                )
                inp = blocks[-1]
                safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
                feats = jnp.where(inp.frontier_mask[:, None], features[safe], 0)
                bl = jnp.where(mk, labels[jnp.where(mk, s, 0)], 0)
                (loss, acc), grads = jax.value_and_grad(
                    trainer._loss_fn, has_aux=True
                )(st.params, blocks, feats, bl, mk, k_d)
                loss_t = loss_t + loss
                gsum = grads if gsum is None else jax.tree.map(
                    jnp.add, gsum, grads
                )
            grads = jax.tree.map(lambda g: g / U, gsum)
            updates, opt_state = trainer.optimizer.update(
                grads, st.opt_state, st.params
            )
            params = optax.apply_updates(st.params, updates)
            from dist_gnn_tpu.training.trainer import TrainState
            return TrainState(params=params, opt_state=opt_state,
                              step=st.step + U)

        bench(f"microbatch x{U} (independent subgraphs)", microbatch, state,
              per=U)

    # batch=1024 single step
    gen2 = SeedGenerator(arrays["train_idx"], 1024, shuffle=True,
                         drop_last=True)
    s2, mk2 = next(gen2.epoch(jax.random.key(5)))
    jax.block_until_ready((s2, mk2))
    tr2 = Trainer(model=model, fan_out=FAN_OUT, dedup_last=False,
                  frontier_caps=(6144, 53248, 10**9),
                  sampler_window=(128, 1024), sampler_big_budget=(8192, 2048))
    st2 = tr2.init_state(jax.random.key(0))

    def one2(st):
        st_, _ = tr2.train_step(st, graph, features, labels, s2, mk2,
                                jax.random.key(7))
        return st_

    blocks2, stats2 = sample_blocks(
        graph, s2, mk2, FAN_OUT, False, jax.random.key(7),
        dedup_last=False, frontier_caps=(6144, 53248, 10**9),
        window=(128, 1024), big_row_budget=(8192, 2048),
    )
    e2 = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks2))
    print(f"batch1024: edges/step {e2}  sampler_ovf "
          f"{int(stats2['sampler_overflow'])} frontier_ovf "
          f"{int(stats2['frontier_overflow'])}", flush=True)
    dt2 = measure_chain(one2, st2, n_lo=4, n_hi=16, reps=3)
    print(f"{'batch=1024 single step':44s} {dt2*1e3:8.3f} ms  -> "
          f"{e2/dt2/1e6:6.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
