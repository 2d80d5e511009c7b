"""Sort vs dense relabel at bench hop shapes + sampling with the per-hop
window heuristic (window_min_slots) + tuned full step.

Run: timeout 1800 python -u scripts/probe_step9.py > /tmp/probe9.log 2>&1
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
from dist_gnn_tpu.ops.relabel import unique_and_relabel, unique_and_relabel_dense
from dist_gnn_tpu.ops.sampling import sample_uniform
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_chain

SAMP_KW = dict(
    dedup_last=False,
    frontier_caps=(3072, 26624, 10**9),
    window=(128, 1024),
    big_row_budget=(5120, 1024),
)
FAN_OUT = (15, 10, 5)


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
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    seeds, mask = next(gen.epoch(jax.random.key(100)))
    jax.block_until_ready((seeds, mask))

    def bench(name, fn, init):
        dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=3)
        print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    # fixed hop inputs
    blocks, _ = sample_blocks(
        graph, seeds, mask, FAN_OUT, False, jax.random.key(7), **SAMP_KW
    )
    blocks = jax.block_until_ready(blocks)
    hop_inputs = [
        (seeds, mask, 5),
        (blocks[0].frontier, blocks[0].frontier_mask, 10),
    ]

    # ---- relabel: sort vs dense at hop shapes ----
    for (s_, m_, k) in hop_inputs:
        s_ = jax.block_until_ready(jnp.where(m_, s_, -1))
        nb = jax.block_until_ready(
            sample_uniform(graph, s_, k, False, jax.random.key(11))
        )

        @jax.jit
        def rl_sort(c, nb=nb, s_=s_):
            ids2 = nb.ids + (c & 0)
            rl = unique_and_relabel(s_, ids2, nb.mask)
            return c + jnp.sum(rl.neigh_slots) + jnp.sum(rl.frontier)

        @jax.jit
        def rl_dense(c, nb=nb, s_=s_):
            ids2 = nb.ids + (c & 0)
            rl = unique_and_relabel_dense(s_, ids2, nb.mask, graph.num_nodes)
            return c + jnp.sum(rl.neigh_slots) + jnp.sum(rl.frontier)

        B = s_.shape[0]
        bench(f"relabel SORT  B={B} k={k}", rl_sort, jnp.int32(0))
        bench(f"relabel DENSE B={B} k={k}", rl_dense, jnp.int32(0))

    # ---- sampling with per-hop window heuristic (fully consumed) ----
    def consume_blocks(blks):
        t = jnp.int32(0)
        for b in blks:
            t = t + jnp.sum(b.frontier) + jnp.sum(b.neigh_slots) + b.num_frontier
        return t

    for wms, mode in [(0, "auto"), (65536, "auto"), (65536, "dense")]:
        @jax.jit
        def samp(c, wms=wms, mode=mode):
            k = jax.random.wrap_key_data(
                jax.random.key_data(jax.random.key(7)) + c.astype(jnp.uint32)
            )
            blks, _ = sample_blocks(
                graph, seeds, mask, FAN_OUT, False, k,
                relabel_mode=mode, window_min_slots=wms, **SAMP_KW,
            )
            return consume_blocks(blks).astype(jnp.uint32)

        bench(f"sample wms={wms} relabel={mode}", samp, jnp.uint32(0))

    # ---- tuned full step ----
    model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)
    for wms, mode in [(65536, "auto"), (65536, "dense")]:
        trainer = Trainer(
            model=model, fan_out=FAN_OUT, dedup_last=False,
            frontier_caps=(3072, 26624, 10**9),
            sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
            window_min_slots=wms, relabel_mode=mode,
        )
        state = trainer.init_state(jax.random.key(0))

        def full(st, trainer=trainer):
            st2, _ = trainer.train_step(
                st, graph, features, labels, seeds, mask, jax.random.key(7)
            )
            return st2

        bench(f"FULL tuned wms={wms} relabel={mode}", full, state)

    # tuned fused step with optimization barriers after sampling and after
    # the gather (prevents XLA from re-fusing sampler reductions into the
    # fwd/bwd consumers)
    import optax

    trainer_t = Trainer(
        model=model, fan_out=FAN_OUT, dedup_last=False,
        frontier_caps=(3072, 26624, 10**9),
        sampler_window=(128, 1024), sampler_big_budget=(5120, 1024),
        window_min_slots=65536, relabel_mode="dense",
    )
    state_t = trainer_t.init_state(jax.random.key(0))

    @jax.jit
    def full_barrier(st):
        k_sample, k_drop = jax.random.split(
            jax.random.fold_in(jax.random.key(7), st.step)
        )
        blks, _ = sample_blocks(
            graph, seeds, mask, FAN_OUT, False, k_sample,
            relabel_mode="dense", window_min_slots=65536, **SAMP_KW,
        )
        blks = jax.lax.optimization_barrier(blks)
        inp = blks[-1]
        safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
        feats = jax.lax.optimization_barrier(
            jnp.where(inp.frontier_mask[:, None], features[safe], 0)
        )
        batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(
            trainer_t._loss_fn, has_aux=True
        )(st.params, blks, feats, batch_labels, mask, k_drop)
        updates, opt_state = trainer_t.optimizer.update(
            grads, st.opt_state, st.params
        )
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("FULL tuned + blocks/feats barriers", full_barrier, state_t)

    # tuned split-phase (2 jits: sample+gather | model+adam)
    @jax.jit
    def phase1(c):
        k_sample = jax.random.split(
            jax.random.fold_in(jax.random.key(7), c)
        )[0]
        blks, _ = sample_blocks(
            graph, seeds, mask, FAN_OUT, False, k_sample,
            relabel_mode="dense", window_min_slots=65536, **SAMP_KW,
        )
        inp = blks[-1]
        safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
        feats = jnp.where(inp.frontier_mask[:, None], features[safe], 0)
        return blks, feats

    @jax.jit
    def phase2(st, blks, feats):
        batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, acc), grads = jax.value_and_grad(
            trainer_t._loss_fn, has_aux=True
        )(st.params, blks, feats, batch_labels, mask, jax.random.key(5))
        updates, opt_state = trainer_t.optimizer.update(
            grads, st.opt_state, st.params
        )
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    def split(st):
        blks, feats = phase1(st.step)
        return phase2(st, blks, feats)

    bench("SPLIT tuned (2 jits)", split, state_t)

    # hoist the first-layer input aggregation OUT of value_and_grad — it
    # does not depend on params, so the bwd pass can never recompute it
    def loss_hoisted(params, blks, h_dst0, h_mean0, lab, k_drop):
        from dist_gnn_tpu.ops.prng import dropout_keep

        cd = jnp.bfloat16
        bl = tuple(reversed(blks))
        h = None
        for l, block in enumerate(bl):
            p = params[f"layer{l}"]
            if l == 0:
                h_dst, h_mean = h_dst0.astype(cd), h_mean0.astype(cd)
            else:
                h_dst = h[: block.num_dst]
                from dist_gnn_tpu.ops.spmm import gather_mean

                h_mean = gather_mean(h, block.neigh_slots, block.neigh_mask)
            out = (
                jnp.dot(h_dst, p["w_self"].astype(cd),
                        preferred_element_type=jnp.float32)
                + jnp.dot(h_mean, p["w_neigh"].astype(cd),
                          preferred_element_type=jnp.float32)
                + p["b"]
            ).astype(cd)
            h = out
            if l != len(bl) - 1:
                h = jax.nn.relu(h)
                k_drop, sub = jax.random.split(k_drop)
                keep = dropout_keep(sub, h.shape, 0.5)
                h = jnp.where(keep, h / 0.5, 0)
        logits = h
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(
            ll, lab[:, None].astype(jnp.int32), axis=1
        )[:, 0]
        nll = jnp.where(mask, nll, 0.0)
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        return jnp.sum(nll) / n, 0.0

    @jax.jit
    def full_hoisted(st):
        k_sample, k_drop = jax.random.split(
            jax.random.fold_in(jax.random.key(7), st.step)
        )
        blks, _ = sample_blocks(
            graph, seeds, mask, FAN_OUT, False, k_sample,
            relabel_mode="dense", window_min_slots=65536, **SAMP_KW,
        )
        inp = blks[-1]
        safe = jnp.where(inp.frontier_mask, inp.frontier, 0)
        feats = jnp.where(inp.frontier_mask[:, None], features[safe], 0)
        b0 = blks[-1]
        B, k = b0.neigh_mask.shape
        h_dst0 = feats[: b0.num_dst]
        nb = feats[b0.num_dst :].reshape(B, k, feats.shape[1])
        m = b0.neigh_mask[..., None].astype(feats.dtype)
        cnt = jnp.sum(b0.neigh_mask, axis=1, dtype=feats.dtype)[:, None]
        h_mean0 = jnp.sum(nb * m, axis=1) / jnp.maximum(cnt, 1)
        batch_labels = jnp.where(mask, labels[jnp.where(mask, seeds, 0)], 0)
        (loss, _), grads = jax.value_and_grad(loss_hoisted, has_aux=True)(
            st.params, blks, h_dst0, h_mean0, batch_labels, k_drop
        )
        updates, opt_state = trainer_t.optimizer.update(
            grads, st.opt_state, st.params
        )
        params = optax.apply_updates(st.params, updates)
        return type(st)(params=params, opt_state=opt_state, step=st.step + 1)

    bench("FULL tuned + hoisted first agg", full_hoisted, state_t)

    # hop3 window cascade variants (fully consumed)
    inp2 = blocks[1]
    s3 = jax.block_until_ready(
        jnp.where(inp2.frontier_mask, inp2.frontier, -1)
    )
    for win, bud in [
        ((128, 1024), (5120, 1024)),
        ((256, 2048), (2048, 512)),
        ((256,), (5120,)),
        ((64, 1024), (8192, 1024)),
        ((128, 2048), (5120, 512)),
    ]:
        win_t = win if len(win) > 1 else win[0]
        bud_t = bud if len(bud) > 1 else bud[0]

        @jax.jit
        def hop3(c, win_t=win_t, bud_t=bud_t):
            s2 = s3 + (c & 0)
            nb = sample_uniform(
                graph, s2, 15, False, jax.random.key(11),
                window=win_t, big_row_budget=bud_t,
            )
            return c + jnp.sum(nb.ids) + jnp.sum(nb.overflow)

        bench(f"hop3 win={win} bud={bud}", hop3, jnp.int32(0))


if __name__ == "__main__":
    main()
