"""Round-5: GAT train step under round-4 hand knobs vs round-5 tuned
knobs (GAT regressed 10.4 -> 11.5 ms while SAGE improved — suspect a
knob interaction, e.g. the 27136 vs 26624 hop-2 cap).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT
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
gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
it = gen.epoch(jax.random.key(100))
batches = [next(it) for _ in range(8)]
sU = jnp.stack([b[0] for b in batches])
mkU = jnp.stack([b[1] for b in batches])

model = GAT(features.shape[1], 128, meta["num_classes"], 3, num_heads=4,
            compute_dtype=jnp.bfloat16)
CONFIGS = {
    "hand-r4": dict(frontier_caps=(3072, 26624, 10**9),
                    sampler_window=(128, 1024),
                    sampler_big_budget=(5120, 1024)),
    "tuned-r5": dict(frontier_caps=(3072, 27136, 10**9),
                     sampler_window=(128, 1024),
                     sampler_big_budget=(4864, 896)),
    "tuned-cap26624": dict(frontier_caps=(3072, 26624, 10**9),
                           sampler_window=(128, 1024),
                           sampler_big_budget=(4864, 896)),
}
for name, kw in CONFIGS.items():
    tr = Trainer(model=model, fan_out=(15, 10, 5), dedup_last=False, **kw)
    state = tr.init_state(jax.random.key(0))

    def one(s):
        s2, _ = tr.train_step_multi(s, graph, features, labels, sU, mkU,
                                    jax.random.key(7))
        return s2

    dt = measure_chain(one, state, n_lo=3, n_hi=9, reps=2) / 8
    print(f"{name}: {dt * 1e3:.2f} ms/step", flush=True)
