"""Bigger-than-HBM training demo: 20 GB host-resident features on a 16 GB
v5e chip, hot tier in HBM, per-batch miss staging overlapped with compute.

This is the reference's raison d'etre (graph larger than device memory,
pinned-host UVA miss path — src/common/pin_memory.cc) on the TPU design:
measures the steady-state pipelined step vs the sequential
(stage-then-compute) step to show staging rides under compute.

Run: timeout 3000 python -u scripts/bench_host_tier.py > /tmp/bench_ht.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.host_tier import HostFeatureStore
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.training.pipeline import HostTierTrainer

N = 20_000_000
AVG_DEG = 15
F = 256  # f32 -> 20.5 GB features, > 16 GB HBM
CLASSES = 64
BATCH = 512
FAN_OUT = (15, 10, 5)
HOT = 2_000_000  # HBM hot rows (bf16 -> ~1 GB)
MISS_BUDGET = 262_144


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # --- structure: zipf-ish, built with the native CSC builder
    E = N * AVG_DEG
    log(f"generating {E/1e6:.0f}M edges ...")
    u = rng.random(E, dtype=np.float32)
    power = 0.8
    dst = ((N ** (1 - power)) * u + (1 - u)) ** (1 / (1 - power))
    dst = np.clip(dst.astype(np.int64) - 1, 0, N - 1).astype(np.int32)
    src = rng.integers(0, N, E, dtype=np.int32)
    log("building CSC (native OpenMP) ...")
    hg = HostGraph.from_coo(src, dst, N)
    del src, dst, u
    log(f"graph: {hg.num_edges/1e6:.0f}M edges, max_degree={hg.max_degree}")
    graph = hg.to_device()  # structure fits HBM (~1.3 GB)

    # --- features: 20 GB host-resident (NEVER uploaded wholesale)
    log("allocating 20 GB host feature matrix ...")
    feats = np.empty((N, F), np.float32)
    pattern = rng.standard_normal((64, F)).astype(np.float32)
    for i in range(0, N, 64):  # cheap deterministic fill, real pages
        feats[i : i + 64] = pattern[: min(64, N - i)]
    labels = rng.integers(0, CLASSES, N).astype(np.int32)
    gb = feats.nbytes / 2**30
    log(f"features: {gb:.1f} GiB host-resident (chip HBM is 16 GiB)")

    # hot tier: top-degree rows (degree ~ heat for zipf access)
    deg = np.diff(np.asarray(hg.indptr))
    hot_ids = np.argpartition(deg, -HOT)[-HOT:].astype(np.int32)
    store = HostFeatureStore(
        feats, hot_ids, miss_budget=MISS_BUDGET, hot_dtype=np.float32
    )
    log("hot tier resident")

    model = SAGE(F, 256, CLASSES, len(FAN_OUT), compute_dtype=jnp.bfloat16)
    trainer = HostTierTrainer(
        model=model, fan_out=FAN_OUT, store=store,
        dedup_last=False, sampler_window=(128, 2048),
        sampler_big_budget=(5120, 2048),
    )
    state = trainer.init_state(jax.random.key(0))

    train_ids = rng.integers(0, N, 200_000).astype(np.int32)

    def batches(n):
        for i in range(n):
            lo = (i * BATCH) % (len(train_ids) - BATCH)
            yield train_ids[lo : lo + BATCH], np.ones(BATCH, bool)

    # warmup / compile
    log("compiling (warmup batches) ...")
    state, ms = trainer.train_batches(state, graph, labels, batches(3),
                                      jax.random.key(1))
    log(f"warmup done; miss per batch ~{ms[-1]['feat_miss']}, "
        f"overflow {ms[-1]['feat_overflow']}")

    # steady-state pipelined epoch slice
    NB = 24
    t0 = time.perf_counter()
    state, ms = trainer.train_batches(state, graph, labels, batches(NB),
                                      jax.random.key(2))
    jax.block_until_ready(state.params)
    dt_pipe = (time.perf_counter() - t0) / NB
    miss = float(np.mean([m["feat_miss"] for m in ms]))
    log(f"pipelined: {dt_pipe*1e3:.1f} ms/batch, mean miss rows {miss:.0f}, "
        f"overflow total {sum(m['feat_overflow'] for m in ms)}")

    # sequential reference: force completion between stage and compute
    t0 = time.perf_counter()
    for i, (s, mk) in enumerate(batches(NB)):
        k_i = jax.random.fold_in(jax.random.key(3), i)
        blocks, _ = trainer._sample_device(
            graph, jnp.asarray(s), jnp.asarray(mk), k_i
        )
        fr = np.asarray(blocks[-1].frontier)
        fm = np.asarray(blocks[-1].frontier_mask)
        staged = trainer.store.stage(fr, fm)
        jax.block_until_ready(staged.rows)  # serialize H2D
        lab = labels[np.where(mk, s, 0)].astype(np.int32)
        state, m = trainer.compute_step(
            state, trainer.store.hot_tier, blocks, staged.rows, staged.slots,
            jnp.asarray(lab), jnp.asarray(mk), k_i,
        )
        jax.block_until_ready(m["loss"])  # serialize compute
    dt_seq = (time.perf_counter() - t0) / NB
    log(f"sequential: {dt_seq*1e3:.1f} ms/batch "
        f"-> overlap saves {(dt_seq-dt_pipe)*1e3:.1f} ms/batch "
        f"({(1-dt_pipe/dt_seq)*100:.0f}%)")
    log(f"loss finite: {np.isfinite(float(ms[-1]['loss']))}")


if __name__ == "__main__":
    main()
