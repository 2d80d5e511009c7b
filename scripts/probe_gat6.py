"""Round-5: per-layer-count GAT model-phase grads dissection — fan_out
(15,), (10,5), (15,10,5) — to locate the non-kernel ~2 ms in the 3-layer
phase (probe_gat5: full grads 3.86 ms vs ~1.7 ms of kernel micro time).
Also measures a dropout-free variant (dropout_keep cost) and SAGE at the
same shapes for the floor.
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
from dist_gnn_tpu.utils.timing import measure_op

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
graph = hg.to_device(with_indptr_pairs=True, window_pair=(128, 1024))
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])
gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
seeds, mask = next(gen.epoch(jax.random.key(100)))

CONFIGS = [
    ("l0-only", (15,), (10**9,)),
    ("upper-2", (10, 5), (3072, 10**9)),
    ("full-3", (15, 10, 5), (3072, 26624, 10**9)),
]

for name, fo, caps in CONFIGS:
    blocks, _ = sample_blocks(
        graph, seeds, mask, fo, False, jax.random.key(7),
        dedup_last=False, window=(128, 1024), big_row_budget=(4864, 896),
        frontier_caps=caps,
    )
    frontier_ids = jnp.where(
        blocks[-1].frontier_mask, blocks[-1].frontier, 0
    ).astype(jnp.int32)
    feats_fixed = features[frontier_ids]
    batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
    for mname, dropout in (("gat", 0.5), ("gat-nodrop", 0.0), ("sage", 0.5)):
        if mname.startswith("gat"):
            model = GAT(features.shape[1], 128, meta["num_classes"], len(fo),
                        num_heads=4, dropout=dropout,
                        compute_dtype=jnp.bfloat16)
        else:
            model = SAGE(features.shape[1], 256, meta["num_classes"], len(fo),
                         compute_dtype=jnp.bfloat16)
        tr = Trainer(model=model, fan_out=fo, dedup_last=False,
                     frontier_caps=caps, sampler_window=(128, 1024),
                     sampler_big_budget=(4864, 896))
        state = tr.init_state(jax.random.key(0))

        def model_phase(c, params, blks, feats, lab, mk):
            rng = jax.random.fold_in(jax.random.key(9), c[0].astype(jnp.int32))
            (loss, _), grads = jax.value_and_grad(
                tr._loss_fn, has_aux=True
            )(params, blks, feats * (1 + c[0] * 1e-9), lab, mk, rng)
            leaf = jax.tree.leaves(grads)[0]
            return (c[0] + 1.0 + loss * 0 + jnp.sum(leaf) * 1e-20,)

        t = measure_op(
            model_phase, (jnp.zeros(()),), iters=8,
            args=(state.params, blocks, feats_fixed, batch_labels, mask),
        )
        print(f"{name} {mname}: grads {t * 1e3:.2f} ms", flush=True)
