"""Probe: unroll x2 combined with batch=1024; unroll x3; honest-lossless
budget checks for the 1024 config.

Run: timeout 2400 python -u scripts/probe_step12.py > /tmp/probe12.log 2>&1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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

    def run_cfg(name, batch, caps, bud, U):
        kw = dict(frontier_caps=caps, dedup_last=False,
                  sampler_window=(128, 1024), sampler_big_budget=bud)
        trainer = Trainer(model=model, fan_out=FAN_OUT, **kw)
        state = trainer.init_state(jax.random.key(0))
        gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True,
                            drop_last=True)
        it = gen.epoch(jax.random.key(100))
        batches = [next(it) for _ in range(max(U, 2))]
        jax.block_until_ready(batches)
        # losslessness check (6 keys)
        ovf = fovf = 0
        for t in range(6):
            _, stats = sample_blocks(
                graph, batches[0][0], batches[0][1], FAN_OUT, False,
                jax.random.key(50 + t), dedup_last=False, frontier_caps=caps,
                window=(128, 1024), big_row_budget=bud,
            )
            ovf += int(stats["sampler_overflow"])
            fovf += int(stats["frontier_overflow"])
        blocks, _ = sample_blocks(
            graph, batches[0][0], batches[0][1], FAN_OUT, False,
            jax.random.key(7), dedup_last=False, frontier_caps=caps,
            window=(128, 1024), big_row_budget=bud,
        )
        e = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks))

        @jax.jit
        def stepU(st):
            for u in range(U):
                s, mk = batches[u % len(batches)]
                st, _ = trainer.train_step.__wrapped__(
                    trainer, st, graph, features, labels, s, mk,
                    jax.random.key(11 + u),
                )
            return st

        dt = measure_chain(stepU, state, n_lo=4, n_hi=16, reps=3) / U
        print(f"{name:42s} {dt*1e3:7.3f} ms/step  {e/dt/1e6:6.1f} M edges/s "
              f"(edges {e}, samp_ovf {ovf}, front_ovf {fovf})", flush=True)

    run_cfg("b512 U3", 512, (3072, 26624, 10**9), (5120, 1024), 3)
    run_cfg("b1024 U1", 1024, (6144, 52224, 10**9), (8192, 2048), 1)
    run_cfg("b1024 U2", 1024, (6144, 52224, 10**9), (8192, 2048), 2)


if __name__ == "__main__":
    main()
