"""Tune the bench step: frontier fill rates, window cascade, frontier caps.

Run: timeout 2400 python -u scripts/probe_step4.py > /tmp/probe4.log 2>&1
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
    deg = np.diff(hg.indptr)
    print("deg: max", deg.max(), " p99.9", np.percentile(deg, 99.9),
          " >1024:", (deg > 1024).sum(), " >2048:", (deg > 2048).sum(), flush=True)
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    labels = jnp.asarray(arrays["labels"])
    fan_out = (15, 10, 5)
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    it = gen.epoch(jax.random.key(100))
    batches = [next(it) for _ in range(8)]
    jax.block_until_ready(batches[0])

    # --- per-hop fill
    for t in range(3):
        s, mk = batches[t]
        blocks, stats = sample_blocks(
            graph, s, mk, fan_out, False, jax.random.key(t), dedup_last=False,
        )
        sizes = [
            (int(b.num_frontier), b.frontier.shape[0]) for b in blocks
        ]
        print(f"batch{t} frontier (valid, cap):", sizes,
              " big rows (deg>window picks) n/a", flush=True)

    def bench(name, samp_kwargs, caps=None):
        @jax.jit
        def samp(i):
            blocks, stats = sample_blocks(
                graph, batches[0][0], batches[0][1], fan_out, False,
                jax.random.fold_in(jax.random.key(0), i),
                dedup_last=False, frontier_caps=caps, **samp_kwargs,
            )
            return blocks[-1].frontier, stats["sampler_overflow"], stats[
                "frontier_overflow"]

        def step(carry):
            i, _ = carry
            f, so, fo = samp(i)
            return (i + 1 + (f[0] & 0), (so, fo))

        dt = measure_chain(step, (jnp.int32(0), None), n_lo=3, n_hi=9)
        _, (so, fo) = step((jnp.int32(0), None))
        print(f"{name}: {dt*1e3:.3f} ms  sampler_ovf={int(so)} frontier_ovf={int(fo)}",
              flush=True)

    bench("samp W128/5120        ", dict(window=128, big_row_budget=5120))
    bench("samp W(128,1024)/(5120,1024)", dict(window=(128, 1024), big_row_budget=(5120, 1024)))
    bench("samp W(128,2048)/(5120,512) ", dict(window=(128, 2048), big_row_budget=(5120, 512)))

    # caps: trim hop1/hop2 capacity (sampling order: k=5 then 10 then 15)
    for caps in (None, (2816, 26624), (2560, 24576)):
        name = f"samp cascade caps={caps}"
        bench(name, dict(window=(128, 1024), big_row_budget=(5120, 1024)),
              caps=(caps + (10**9,)) if caps else None)

    # --- full train step with the best combo
    for name, kw, caps in (
        ("step base (r01 cfg)", dict(sampler_window=128, sampler_big_budget=5120), None),
        ("step cascade", dict(sampler_window=(128, 1024), sampler_big_budget=(5120, 1024)), None),
        ("step cascade+caps", dict(sampler_window=(128, 1024), sampler_big_budget=(5120, 1024)), (2816, 26624, 10**9)),
    ):
        model = SAGE(100, 256, meta["num_classes"], len(fan_out),
                     compute_dtype=jnp.bfloat16)
        trainer = Trainer(
            model=model, fan_out=fan_out, dedup_last=False,
            frontier_caps=caps, **kw,
        )
        state = trainer.init_state(jax.random.key(0))
        ctr = {"i": 0}

        def one(s_):
            s, mk = batches[ctr["i"] % len(batches)]
            ctr["i"] += 1
            s2, m = trainer.train_step(s_, graph, features, labels, s, mk,
                                       jax.random.key(7))
            return s2

        dt = measure_chain(one, state, n_lo=3, n_hi=9)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
