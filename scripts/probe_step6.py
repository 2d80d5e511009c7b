"""Within-run A/B: threefry bernoulli dropout vs mix32 dropout_keep.

Run: timeout 1800 python -u scripts/probe_step6.py > /tmp/probe6.log 2>&1
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


class SAGEBern(SAGE):
    """SAGE with the old jax.random.bernoulli dropout (A/B reference)."""

    def apply(self, params, blocks, x, *, train=False, rng=None,
              contiguous_first=False):
        import dist_gnn_tpu.models.sage as sage_mod

        orig = sage_mod.dropout_keep
        sage_mod.dropout_keep = (
            lambda sub, shape, keep: jax.random.bernoulli(sub, keep, shape)
        )
        try:
            return super().apply(
                params, blocks, x, train=train, rng=rng,
                contiguous_first=contiguous_first,
            )
        finally:
            sage_mod.dropout_keep = orig


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

    def run(name, model):
        trainer = Trainer(model=model, fan_out=fan_out, **KW)
        state = trainer.init_state(jax.random.key(0))
        ctr = {"i": 0}

        def one(s_):
            s, mk = batches[ctr["i"] % len(batches)]
            ctr["i"] += 1
            s2, _ = trainer.train_step(s_, graph, features, labels, s, mk,
                                       jax.random.key(7))
            return s2

        dt = measure_chain(one, state, n_lo=3, n_hi=9)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)

    for rep in range(2):
        run(f"mix32 dropout   (rep{rep})",
            SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16))
        run(f"bernoulli dropout(rep{rep})",
            SAGEBern(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16))
        run(f"dropout=0        (rep{rep})",
            SAGE(100, 256, meta["num_classes"], 3, dropout=0.0,
                 compute_dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
