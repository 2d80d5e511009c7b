"""Squeeze the remaining step: relabel mode, metrics cost, dropout cost.

Run: timeout 2400 python -u scripts/probe_step5.py > /tmp/probe5.log 2>&1
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
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

KW = dict(
    dedup_last=False,
    frontier_caps=(3072, 26624, 10**9),
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
    fan_out = (15, 10, 5)
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    it = gen.epoch(jax.random.key(100))
    batches = [next(it) for _ in range(8)]
    jax.block_until_ready(batches[0])

    def run(name, trainer, drop_metrics=False):
        state = trainer.init_state(jax.random.key(0))
        ctr = {"i": 0}
        if drop_metrics:
            @jax.jit
            def stateonly(s_, seeds, mask):
                s2, _ = trainer.train_step(
                    s_, graph, features, labels, seeds, mask, jax.random.key(7)
                )
                return s2

            def one(s_):
                s, mk = batches[ctr["i"] % len(batches)]
                ctr["i"] += 1
                return stateonly(s_, s, mk)
        else:
            def one(s_):
                s, mk = batches[ctr["i"] % len(batches)]
                ctr["i"] += 1
                s2, m = trainer.train_step(
                    s_, graph, features, labels, s, mk, jax.random.key(7)
                )
                return s2

        dt = measure_chain(one, state, n_lo=3, n_hi=9)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)

    base = dict(KW)
    model = lambda: SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    run("tuned (auto relabel)", Trainer(model=model(), fan_out=fan_out, **base))
    run("relabel=dense       ", Trainer(model=model(), fan_out=fan_out,
                                        relabel_mode="dense", **base))
    run("relabel=sort        ", Trainer(model=model(), fan_out=fan_out,
                                        relabel_mode="sort", **base))
    run("metrics dropped     ", Trainer(model=model(), fan_out=fan_out, **base),
        drop_metrics=True)
    m0 = SAGE(100, 256, meta["num_classes"], 3, dropout=0.0,
              compute_dtype=jnp.bfloat16)
    run("dropout=0           ", Trainer(model=m0, fan_out=fan_out, **base))


if __name__ == "__main__":
    main()
