"""Interleaved 3-way A/B: GAT step with fused-all / jnp-all / hybrid
(kernel on layer 0 only) at the bench config.

Result (2026-08-21, v5e): hyb0 11.55-12.96 ms/step — WORSE than both
fused-all (11.24-11.66) and jnp-all (11.15-11.50) across 3 interleaved
rounds.  The step-level scheduling cost of the fused path is the
layer-0 pallas fwd/bwd pair itself, not the number of pallas calls;
dropping the upper-layer kernels recovers nothing.  jnp-all remains the
measured-best train config (bench.py reports the winner); the per-layer
``use_fused`` collection stays as a tested knob.
"""
import time
import numpy as np
from dist_gnn_tpu.utils.platform import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from dist_gnn_tpu.cache.autotune import tune_sampler_cost
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
fan_out = (15, 10, 5)
batch = 512
cfg, _ = tune_sampler_cost(arrays["indptr"], arrays["indices"],
                           arrays["train_idx"], batch, fan_out)
graph = hg.to_device(with_indptr_pairs=True, window_pair=cfg.window)
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])

gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True, drop_last=True)
batches = []
it = gen.epoch(jax.random.key(100))
for _ in range(8):
    batches.append(next(it))
sU = jnp.stack([b[0] for b in batches])
mkU = jnp.stack([b[1] for b in batches])
jax.block_until_ready((sU, mkU))

def mk(use_fused):
    gat = GAT(100, 128, 47, 3, num_heads=4, compute_dtype=jnp.bfloat16,
              use_fused=use_fused)
    tr = Trainer(model=gat, fan_out=fan_out, dedup_last=False,
                 **cfg.trainer_kwargs())
    st = tr.init_state(jax.random.key(0))
    def one(s):
        s2, _ = tr.train_step_multi(s, graph, features, labels, sU, mkU,
                                    jax.random.key(7))
        return s2
    return one, st

trio = [(tag, *mk(uf)) for tag, uf in
        (("fused", True), ("jnp", False), ("hyb0", (0,)))]
for tag, one, st in trio:
    t0 = time.time(); one(st); print(f"# {tag} compile {time.time()-t0:.0f}s",
                                     flush=True)
for rnd in range(3):
    for tag, one, st in trio:
        dt = measure_chain(one, st, n_lo=3, n_hi=9, reps=2) / 8
        print(f"round {rnd} {tag}: {dt*1e3:.3f} ms/step", flush=True)
