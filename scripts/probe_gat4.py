"""Round-5: GAT train step dissection — full step (train_step_multi chain)
vs model-only phase (measure_op fori) under the bench config, to locate
the gap between the kernel micro numbers (probe_gat3: l0 vag 1.34 ms) and
the bench gat_edges_per_s.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.cache.autotune import tune_sampler_cost
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT, SAGE
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain, measure_op

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
fan_out = (15, 10, 5)
batch = 512
cfg, _ = tune_sampler_cost(
    arrays["indptr"], arrays["indices"], arrays["train_idx"], batch, fan_out
)
print("knobs:", cfg, flush=True)
graph = hg.to_device(with_indptr_pairs=True, window_pair=cfg.window)
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])

gen = SeedGenerator(arrays["train_idx"], batch, shuffle=True, drop_last=True)
batches = [next(gen.epoch(jax.random.key(100))) for _ in range(1)]
it = gen.epoch(jax.random.key(100))
batches = [next(it) for _ in range(8)]
sU = jnp.stack([b[0] for b in batches])
mkU = jnp.stack([b[1] for b in batches])

seeds, mask = batches[0]
blocks, _ = sample_blocks(
    graph, seeds, mask, fan_out, False, jax.random.key(7),
    dedup_last=False, **cfg.sampler_kwargs(),
)
frontier_ids = jnp.where(
    blocks[-1].frontier_mask, blocks[-1].frontier, 0
).astype(jnp.int32)
feats_fixed = features[frontier_ids]
batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)

for name, model in [
    ("sage", SAGE(features.shape[1], 256, meta["num_classes"], 3,
                  compute_dtype=jnp.bfloat16)),
    ("gat", GAT(features.shape[1], 128, meta["num_classes"], 3, num_heads=4,
                compute_dtype=jnp.bfloat16)),
    ("gat-nofuse", GAT(features.shape[1], 128, meta["num_classes"], 3,
                       num_heads=4, compute_dtype=jnp.bfloat16,
                       use_fused=False)),
]:
    tr = Trainer(model=model, fan_out=fan_out, dedup_last=False,
                 **cfg.trainer_kwargs())
    state = tr.init_state(jax.random.key(0))

    def one(s):
        s2, _ = tr.train_step_multi(s, graph, features, labels, sU, mkU,
                                    jax.random.key(7))
        return s2

    dt = measure_chain(one, state, n_lo=3, n_hi=9, reps=2) / 8

    def model_phase(c, params, blks, feats, lab, mk):
        rng = jax.random.fold_in(jax.random.key(9), c[0].astype(jnp.int32))
        (loss, _), grads = jax.value_and_grad(tr._loss_fn, has_aux=True)(
            params, blks, feats, lab, mk, rng
        )
        leaf = jax.tree.leaves(grads)[0]
        return (c[0] + 1.0 + loss * 0 + jnp.sum(leaf) * 1e-20,)

    t_model = measure_op(
        model_phase, (jnp.zeros(()),), iters=8,
        args=(state.params, blocks, feats_fixed, batch_labels, mask),
    )
    print(f"{name}: step {dt * 1e3:.2f} ms, model-phase {t_model * 1e3:.2f} ms",
          flush=True)
