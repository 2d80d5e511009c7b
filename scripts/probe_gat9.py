"""Interleaved A/B: GAT train step fused-Pallas vs jnp fallback, 3
alternating rounds at the bench config — settles the NOTES round-5
'use_fused=False measured 10.99 vs fused 11.52 at STEP level'
within-noise question.

Result (2026-08-21, v5e): jnp 11.13/11.20/11.16 vs fused
11.59/11.47/11.51 ms/step — the jnp path wins consistently by ~0.35 ms
at STEP level (pallas calls are opaque to XLA's cross-step scheduler)
even though the kernel wins every ISOLATED layer measurement.  bench.py
now measures both configs and reports the winner (gat_config extra).
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

one_f, st_f = mk(True)
one_u, st_u = mk(False)
# compile both first
for tag, one, st in (("fused", one_f, st_f), ("jnp", one_u, st_u)):
    t0 = time.time(); one(st); print(f"# {tag} compile {time.time()-t0:.0f}s",
                                     flush=True)
for rnd in range(3):
    for tag, one, st in (("fused", one_f, st_f), ("jnp", one_u, st_u)):
        dt = measure_chain(one, st, n_lo=3, n_hi=9, reps=2) / 8
        print(f"round {rnd} {tag}: {dt*1e3:.3f} ms/step", flush=True)
