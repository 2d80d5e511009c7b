"""Phase-level probe of the bench step config on the real chip.

Times: sampler alone, feature gather alone (XLA vs Pallas-G16), full train
step with gather_group in {0, 16}.

Run: timeout 1800 python -u scripts/probe_step.py > /tmp/probe_step.log 2>&1
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


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    features = jnp.pad(features, ((0, 0), (0, 28)))
    labels = jnp.asarray(arrays["labels"])
    fan_out = (15, 10, 5)
    batch = 512
    gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask, features))

    # --- sampler alone
    @jax.jit
    def samp(i):
        blocks, _ = sample_blocks(
            graph, seeds, mask, fan_out, False,
            jax.random.fold_in(jax.random.key(0), i),
            dedup_last=False, window=128, big_row_budget=5120,
        )
        return blocks[-1].frontier, blocks[-1].frontier_mask

    def samp_step(carry):
        i, _ = carry
        f, fm = samp(i)
        return (i + (f[0] & 0) + 1, f)

    dt = measure_chain(samp_step, (jnp.int32(0), None), n_lo=3, n_hi=9)
    frontier, fmask = samp(jnp.int32(0))
    L = frontier.shape[0]
    print(f"sampler: {dt*1e3:.3f} ms   frontier_cap={L}", flush=True)

    # --- gather alone at the real frontier size
    safe = jnp.where(fmask, frontier, 0)

    from dist_gnn_tpu.ops.gather_pallas import gather_rows

    for name, fn in (
        ("gather_xla", lambda ids: features[ids]),
        ("gather_g16", lambda ids: gather_rows(features, ids, group=16)),
    ):
        @jax.jit
        def g_step(carry, fn=fn):
            i, acc = carry
            out = fn(jnp.roll(safe, i))
            return (i + 1 + (out[0, 0].astype(jnp.int32) & 0),
                    acc + out[0, 0].astype(jnp.float32))

        dt = measure_chain(g_step, (jnp.int32(0), jnp.float32(0)), n_lo=3, n_hi=9)
        print(f"{name}: {dt*1e3:.3f} ms  ({L/dt/1e6:.0f}M rows/s)", flush=True)

    # --- full step, both gather modes
    for gg in (0, 16):
        model = SAGE(128, 256, meta["num_classes"], len(fan_out),
                     compute_dtype=jnp.bfloat16)
        trainer = Trainer(
            model=model, fan_out=fan_out, dedup_last=False,
            sampler_window=128, sampler_big_budget=5120, gather_group=gg,
        )
        state = trainer.init_state(jax.random.key(0))

        def one_step(state, trainer=trainer):
            s, m = trainer.train_step(
                state, graph, features, labels, seeds, mask, jax.random.key(7)
            )
            return s

        dt = measure_chain(one_step, state, n_lo=3, n_hi=9)
        print(f"train_step(gather_group={gg}): {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
