"""Round-5: tuned-vs-hand sampler knobs on the real chip (VERDICT #6).

Measures the bench train step (U=8 fused) under (a) the hand constants
bench.py shipped through round 4 and (b) tune_sampler_cost's pick, plus
the tuner's own host-side wall time.
"""
import time

import jax
import jax.numpy as jnp

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.cache.autotune import tune_sampler_cost
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
graph = hg.to_device(with_indptr_pairs=True, window_pair=(128, 1024))
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])
fan_out = (15, 10, 5)
batch = 512

t0 = time.time()
cfg, pred = tune_sampler_cost(
    arrays["indptr"], arrays["indices"], arrays["train_idx"], batch, fan_out
)
print(f"tuner wall {time.time() - t0:.1f}s -> {cfg} pred {pred:.2f} ms", flush=True)

model = SAGE(features.shape[1], 256, meta["num_classes"], len(fan_out),
             compute_dtype=jnp.bfloat16)

gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True, drop_last=True)
batches = []
it = gen.epoch(jax.random.key(100))
for _ in range(8):
    batches.append(next(it))
UNROLL = 8
sU = jnp.stack([b[0] for b in batches])
mkU = jnp.stack([b[1] for b in batches])

configs = {
    "hand": dict(frontier_caps=(3072, 26624, 10**9),
                 sampler_window=(128, 1024), sampler_big_budget=(5120, 1024)),
    "tuned": cfg.trainer_kwargs(),
}
for name, kw in configs.items():
    tr = Trainer(model=model, fan_out=fan_out, dedup_last=False, **kw)
    state = tr.init_state(jax.random.key(0))

    def one(s):
        s2, _ = tr.train_step_multi(s, graph, features, labels, sU, mkU,
                                    jax.random.key(7))
        return s2

    dt = measure_chain(one, state, n_lo=4, n_hi=16, reps=3) / UNROLL
    _, m = tr.train_step(state, graph, features, labels, batches[0][0],
                         batches[0][1], jax.random.key(7))
    print(f"{name}: {dt * 1e3:.2f} ms/step  ovf={int(m['sampler_overflow'])} "
          f"frontier_ovf={int(m['frontier_overflow'])}", flush=True)
