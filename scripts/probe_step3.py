"""Validate the (G, F)-block output gather: isolation (scalar + full
consumption) and fused with sampler / fwd.

Run: timeout 1800 python -u scripts/probe_step3.py > /tmp/probe3.log 2>&1
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
from dist_gnn_tpu.ops.gather_pallas import gather_rows
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.utils.timing import measure_chain


def main():
    print("device:", jax.devices()[0], flush=True)
    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.pad(
        jnp.asarray(arrays["features"]).astype(jnp.bfloat16), ((0, 0), (0, 28))
    )
    fan_out = (15, 10, 5)
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask, features))

    def sample(i):
        blocks, _ = sample_blocks(
            graph, seeds, mask, fan_out, False,
            jax.random.fold_in(jax.random.key(0), i),
            dedup_last=False, window=128, big_row_budget=5120,
        )
        return blocks

    blocks0 = jax.jit(sample)(jnp.int32(0))
    frontier0 = blocks0[-1].frontier
    fmask0 = blocks0[-1].frontier_mask
    jax.block_until_ready(frontier0)
    safe0 = jnp.where(fmask0, frontier0, 0)
    model = SAGE(128, 256, meta["num_classes"], len(fan_out),
                 compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0))

    def bench(name, fn):
        @jax.jit
        def step(carry):
            i, acc = carry
            out = fn(i)
            return (i + 1 + (out.astype(jnp.int32) & 0), acc + out)

        dt = measure_chain(step, (jnp.int32(0), jnp.float32(0)), n_lo=3, n_hi=9)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)

    g16 = lambda ids: gather_rows(features, ids, group=16)

    # correctness spot-check on TPU
    out = g16(safe0[:1000])
    ref = features[safe0[:1000]]
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )
    print("correctness OK", flush=True)

    bench("iso_scalar   ", lambda i: g16(jnp.roll(safe0, i))[0, 0].astype(jnp.float32))
    bench("iso_fullsum  ", lambda i: jnp.sum(g16(jnp.roll(safe0, i)).astype(jnp.float32)))

    def samp_gather(i):
        blocks = sample(i)
        inp = blocks[-1]
        safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
        feats = jnp.where(inp.frontier_mask[:, None], g16(safe), 0)
        return jnp.sum(feats.astype(jnp.float32))

    bench("sample+g16   ", samp_gather)

    def fwd(i):
        safe = jnp.where(fmask0, frontier0, 0) + (i & 0)
        feats = jnp.where(fmask0[:, None], g16(safe), 0)
        logits = model.apply(
            params, tuple(reversed(blocks0)), feats, train=False,
            contiguous_first=True,
        )
        return jnp.sum(logits.astype(jnp.float32))

    bench("g16+fwd      ", fwd)


if __name__ == "__main__":
    main()
