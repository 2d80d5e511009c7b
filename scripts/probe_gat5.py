"""Round-5: A/B the v1 (in-kernel SDDMM) vs v2 (hoisted SDDMM) GAT kernel
on the REAL model phase (3-layer loss grads at bench shapes) in one
process, to locate the step regression seen after the v2 swap.

Needs: git show <v1-commit>:dist_gnn_tpu/ops/gat_pallas.py > /tmp/gat_pallas_v1.py
"""
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.cache.autotune import tune_sampler_cost
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_op

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
fan_out = (15, 10, 5)
cfg, _ = tune_sampler_cost(
    arrays["indptr"], arrays["indices"], arrays["train_idx"], 512, fan_out
)
graph = hg.to_device(with_indptr_pairs=True, window_pair=cfg.window)
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])
gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
seeds, mask = next(gen.epoch(jax.random.key(100)))
blocks, _ = sample_blocks(
    graph, seeds, mask, fan_out, False, jax.random.key(7),
    dedup_last=False, **cfg.sampler_kwargs(),
)
frontier_ids = jnp.where(
    blocks[-1].frontier_mask, blocks[-1].frontier, 0
).astype(jnp.int32)
feats_fixed = features[frontier_ids]
batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)


def load_as(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


import dist_gnn_tpu.ops.gat_pallas as V2  # noqa: E402

V1 = load_as("/tmp/gat_pallas_v1.py", "gat_pallas_v1")


def measure(tag, mod, train):
    sys.modules["dist_gnn_tpu.ops.gat_pallas"] = mod
    model = GAT(features.shape[1], 128, meta["num_classes"], 3, num_heads=4,
                compute_dtype=jnp.bfloat16)
    tr = Trainer(model=model, fan_out=fan_out, dedup_last=False,
                 **cfg.trainer_kwargs())
    state = tr.init_state(jax.random.key(0))

    def model_phase(c, params, blks, feats, lab, mk):
        rng = jax.random.fold_in(jax.random.key(9), c[0].astype(jnp.int32))
        if train:
            (loss, _), grads = jax.value_and_grad(
                tr._loss_fn, has_aux=True
            )(params, blks, feats, lab, mk, rng)
            leaf = jax.tree.leaves(grads)[0]
            return (c[0] + 1.0 + loss * 0 + jnp.sum(leaf) * 1e-20,)
        logits = model.apply(params, tuple(reversed(blks)), feats,
                             contiguous_first=True)
        return (c[0] + 1.0 + jnp.sum(logits).astype(jnp.float32) * 1e-20,)

    t = measure_op(
        model_phase, (jnp.zeros(()),), iters=8,
        args=(state.params, blocks, feats_fixed, batch_labels, mask),
    )
    print(f"{tag} ({'grads' if train else 'fwd'}): {t * 1e3:.2f} ms",
          flush=True)


for train in (False, True):
    measure("v1", V1, train)
    measure("v2", V2, train)
sys.modules["dist_gnn_tpu.ops.gat_pallas"] = V2
