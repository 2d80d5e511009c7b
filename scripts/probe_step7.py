"""Phase breakdown of the bench train step on the real chip.

Phases (each a data-dependent measure_chain):
  sample   — sample_blocks alone (bench kwargs)
  gather   — feature row gather alone (fixed frontier, full consumption)
  model    — fwd/bwd + Adam alone (fixed blocks + feats)
  full     — trainer.train_step (cross-check: ≈ sample+gather+model)
plus per-hop sampling sub-phases.

Run: timeout 1800 python -u scripts/probe_step7.py > /tmp/probe7.log 2>&1
"""

from __future__ import annotations

import os
import sys
from functools import partial

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

SAMP_KW = dict(
    dedup_last=False,
    frontier_caps=(3072, 26624, 10**9),
    window=(128, 1024),
    big_row_budget=(5120, 1024),
)


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
    seeds, mask = next(it)
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=3)
        print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # ---- sample ----
    @jax.jit
    def samp_step(c):
        k = jax.random.fold_in(jax.random.key(7), 0)
        k = jax.random.wrap_key_data(jax.random.key_data(k) + c.astype(jnp.uint32))
        blocks, _ = sample_blocks(
            graph, seeds, mask, fan_out, False, k, **SAMP_KW
        )
        return blocks[-1].num_frontier

    bench("sample_blocks", samp_step, jnp.int32(0))

    # fixed blocks for downstream phases
    blocks, _ = sample_blocks(
        graph, seeds, mask, fan_out, False, jax.random.key(7), **SAMP_KW
    )
    blocks = jax.block_until_ready(blocks)
    inp = blocks[-1]
    safe_np = jnp.where(inp.frontier_mask, inp.frontier, 0)
    safe_np = jax.block_until_ready(safe_np)

    # ---- gather ----
    @jax.jit
    def gather_step(c):
        ids = safe_np + (c.astype(jnp.int32) & 0)  # data dependence
        feats = jnp.where(inp.frontier_mask[:, None], features[ids], 0)
        return jnp.sum(feats.astype(jnp.float32))

    bench(f"feature gather [{safe_np.shape[0]} rows]", gather_step, jnp.float32(0))

    # gather without the mask/where wrapper
    @jax.jit
    def gather_raw(c):
        ids = safe_np + (c.astype(jnp.int32) & 0)
        return jnp.sum(features[ids].astype(jnp.float32))

    bench("  raw take (no mask/where)", gather_raw, jnp.float32(0))

    # ---- model fwd/bwd + adam ----
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    trainer = Trainer(model=model, fan_out=fan_out, dedup_last=False)
    state0 = trainer.init_state(jax.random.key(0))
    feats_fixed = jax.block_until_ready(
        jnp.where(inp.frontier_mask[:, None], features[safe_np], 0)
    )
    batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)

    @jax.jit
    def model_step(st):
        (loss, acc), grads = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
            st.params, blocks, feats_fixed, batch_labels, mask, jax.random.key(3)
        )
        updates, opt_state = trainer.optimizer.update(grads, st.opt_state, st.params)
        import optax
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("model fwd/bwd+adam", model_step, state0)

    # fwd only
    @jax.jit
    def fwd_step(c):
        logits = model.apply(
            state0.params, tuple(reversed(blocks)),
            feats_fixed + (c * 0).astype(feats_fixed.dtype),
            train=False, contiguous_first=True,
        )
        return jnp.sum(logits.astype(jnp.float32))

    bench("  fwd only", fwd_step, jnp.float32(0))

    # ---- full step ----
    trainer_full = Trainer(
        model=model, fan_out=fan_out,
        frontier_caps=(3072, 26624, 10**9), dedup_last=False,
        sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
    )
    state_f = trainer_full.init_state(jax.random.key(0))

    def full_step(st):
        st2, _ = trainer_full.train_step(
            st, graph, features, labels, seeds, mask, jax.random.key(7)
        )
        return st2

    bench("FULL train_step", full_step, state_f)

    # full step with an optimization barrier between the gather and the
    # model (hypothesis: XLA fuses the 425k-row gather into the masked-mean
    # reduction, degrading it to per-element gathers)
    import optax

    @jax.jit
    def full_barrier(st):
        k_sample, k_drop = jax.random.split(jax.random.fold_in(jax.random.key(7), st.step))
        blks, _ = sample_blocks(
            graph, seeds, mask, fan_out, False, k_sample, **SAMP_KW
        )
        inp2 = blks[-1]
        safe2 = jnp.where(inp2.frontier_mask, inp2.frontier, 0)
        feats2 = jnp.where(inp2.frontier_mask[:, None], features[safe2], 0)
        feats2 = jax.lax.optimization_barrier(feats2)
        batch_labels2 = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(trainer_full._loss_fn, has_aux=True)(
            st.params, blks, feats2, batch_labels2, mask, k_drop
        )
        updates, opt_state = trainer_full.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("FULL step + gather barrier", full_barrier, state_f)

    # barrier after sampling too (isolate sampler-side fusion effects)
    @jax.jit
    def full_barrier2(st):
        k_sample, k_drop = jax.random.split(jax.random.fold_in(jax.random.key(7), st.step))
        blks, _ = sample_blocks(
            graph, seeds, mask, fan_out, False, k_sample, **SAMP_KW
        )
        blks = jax.lax.optimization_barrier(blks)
        inp2 = blks[-1]
        safe2 = jnp.where(inp2.frontier_mask, inp2.frontier, 0)
        feats2 = jnp.where(inp2.frontier_mask[:, None], features[safe2], 0)
        feats2 = jax.lax.optimization_barrier(feats2)
        batch_labels2 = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(trainer_full._loss_fn, has_aux=True)(
            st.params, blks, feats2, batch_labels2, mask, k_drop
        )
        updates, opt_state = trainer_full.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("FULL step + both barriers", full_barrier2, state_f)

    # split-phase: three separate jits chained at host level
    samp_jit = jax.jit(lambda st_step: sample_blocks(
        graph, seeds, mask, fan_out, False,
        jax.random.split(jax.random.fold_in(jax.random.key(7), st_step))[0],
        **SAMP_KW,
    )[0])

    @jax.jit
    def gath_jit(blks):
        inp2 = blks[-1]
        safe2 = jnp.where(inp2.frontier_mask, inp2.frontier, 0)
        return jnp.where(inp2.frontier_mask[:, None], features[safe2], 0)

    @jax.jit
    def model_jit(st, blks, feats2):
        batch_labels2 = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(trainer_full._loss_fn, has_aux=True)(
            st.params, blks, feats2, batch_labels2, mask, jax.random.key(5)
        )
        updates, opt_state = trainer_full.optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    def split_step(st):
        blks = samp_jit(st.step)
        f = gath_jit(blks)
        return model_jit(st, blks, f)

    bench("split-phase (3 jits)", split_step, state_f)

    # ---- per-hop sampling sub-phases ----
    from dist_gnn_tpu.ops.sampling import sample_uniform
    from dist_gnn_tpu.ops.relabel import unique_and_relabel_dense

    hop_shapes = [(512, 5), (3072, 10), (26624, 15)]
    hop_seeds = [seeds, blocks[0].frontier, blocks[1].frontier]
    hop_masks = [mask, blocks[0].frontier_mask, blocks[1].frontier_mask]
    for (B, k), s_, m_ in zip(hop_shapes, hop_seeds, hop_masks):
        s_ = jax.block_until_ready(jnp.where(m_, s_, -1))

        @partial(jax.jit, static_argnames=())
        def hop_step(c, s_=s_, k=k):
            s2 = s_ + (c & 0)
            nb = sample_uniform(
                graph, s2, k, False, jax.random.key(11),
                window=(128, 1024), big_row_budget=(5120, 1024),
            )
            return jnp.sum(nb.ids)

        bench(f"  hop sample B={B} k={k}", hop_step, jnp.int32(0))

    # relabel cost at hop1/hop2 shapes
    for bi, (B, k) in enumerate(hop_shapes[:2]):
        nb_ids = jax.block_until_ready(
            sample_uniform(graph, hop_seeds[bi], k, False, jax.random.key(11))
        )

        @jax.jit
        def rl_step(c, nb=nb_ids, s_=hop_seeds[bi], m_=hop_masks[bi]):
            ids2 = nb.ids + (c & 0)
            rl = unique_and_relabel_dense(s_, ids2, nb.mask, graph.num_nodes)
            return jnp.sum(rl.neigh_slots)

        bench(f"  dense relabel B={B} k={k}", rl_step, jnp.int32(0))


if __name__ == "__main__":
    main()
