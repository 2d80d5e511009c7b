"""Hop-3 cascade grid with overflow verification + tuned FULL step.

Run: timeout 1800 python -u scripts/probe_step10.py > /tmp/probe10.log 2>&1
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
from dist_gnn_tpu.ops.sampling import sample_uniform
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

FAN_OUT = (15, 10, 5)
CAPS = (3072, 26624, 10**9)


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    deg = np.diff(arrays["indptr"])
    for t in (128, 256, 384, 512, 1024, 2048):
        print(f"rows with deg>{t}: {(deg > t).sum()}")
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init, reps=3):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=reps)
        print(f"{name:52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7),
        dedup_last=False, frontier_caps=CAPS,
    )
    blocks = jax.block_until_ready(blocks)
    s3 = jax.block_until_ready(
        jnp.where(blocks[1].frontier_mask, blocks[1].frontier, -1)
    )

    grid = [
        ((256, 2048), (2048, 512)),
        ((256, 2048), (4096, 1024)),
        ((256, 1024), (2048, 1024)),
        ((384, 3072), (1536, 384)),
        ((512, 4096), (1024, 256)),
        ((256, 4096), (2048, 256)),
    ]
    for win, bud in grid:
        @jax.jit
        def hop3(c, win=win, bud=bud):
            s2 = s3 + (c & 0)
            nb = sample_uniform(
                graph, s2, 15, False, jax.random.key(11),
                window=win, big_row_budget=bud,
            )
            return c + jnp.sum(nb.ids) + jnp.sum(nb.overflow)

        # overflow check over several keys
        ovf = 0
        for t in range(6):
            nb = sample_uniform(
                graph, s3, 15, False, jax.random.key(100 + t),
                window=win, big_row_budget=bud,
            )
            ovf += int(nb.overflow)
        dt = bench(f"hop3 win={win} bud={bud} ovf={ovf}", hop3, jnp.int32(0))

    # tuned FULL with the two best configs
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    for win, bud in [((128, 1024), (5120, 1024)), ((256, 2048), (2048, 512)),
                     ((256, 2048), (4096, 1024))]:
        trainer = Trainer(
            model=model, fan_out=FAN_OUT, dedup_last=False,
            frontier_caps=CAPS, sampler_window=win, sampler_big_budget=bud,
        )
        state = trainer.init_state(jax.random.key(0))

        def full(st, trainer=trainer):
            st2, _ = trainer.train_step(
                st, graph, features, labels, seeds, mask, jax.random.key(7)
            )
            return st2

        bench(f"FULL win={win} bud={bud}", full, state)


if __name__ == "__main__":
    main()
