"""Probe: can a VMEM-resident hot tier beat the ~92M rows/s XLA take ceiling?

Questions (all honest: full-output consumption, measure_chain timing):
  a. jnp.take from the big HBM table (baseline ceiling re-check)
  b. jnp.take from a small table (does XLA speed up on small tables?)
  c. Pallas: table resident in VMEM, per-chunk row gather via
     jnp.take(table, idx, axis=0) inside the kernel
  d. same but take_along_axis with indices broadcast to (chunk, 128)
  e. XLA scatter-add rows into a small accumulator (inverted aggregation)
  f. hot-coverage stats: what fraction of final-hop ids fall in the top-K
     most-frequent nodes (the VMEM tier's hit rate upper bound)

Run: timeout 1800 python -u scripts/probe_vmem_gather.py > /tmp/probe_vmem.log 2>&1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.utils.timing import measure_chain

N = 500_000
F = 128
R = 425_984  # final-hop gather rows in the bench config


def bench(name, fn, init, rate_den=None, reps=3):
    dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=reps)
    rate = (rate_den or R) / dt / 1e6
    print(f"{name:58s} {dt*1e3:8.3f} ms  {rate:8.1f} M rows/s", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.key(0)
    table = jax.random.normal(key, (N, F), jnp.float32).astype(jnp.bfloat16)
    # Zipf-ish ids to mimic sampled neighbors (also uniform for contrast)
    rng = np.random.default_rng(0)
    ids_uni = jnp.asarray(rng.integers(0, N, size=R, dtype=np.int32))
    zipf_w = 1.0 / (np.arange(1, N + 1) ** 0.9)
    zipf_p = zipf_w / zipf_w.sum()
    ids_zipf = jnp.asarray(
        rng.choice(N, size=R, p=zipf_p).astype(np.int32)
    )
    jax.block_until_ready((table, ids_uni, ids_zipf))

    # ---- a: HBM take baseline --------------------------------------
    def take_big(c, ids=ids_uni):
        out = table[(ids + (c & 0)) % N]
        return c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 7

    bench("a) take [500k,128]bf16, 425k uniform ids", take_big, jnp.int32(0))

    # ---- b: small-table take ---------------------------------------
    for H in (8_192, 16_384, 65_536):
        small = table[:H]

        def take_small(c, small=small, H=H):
            out = small[(ids_uni + (c & 0)) % H]
            return c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 7

        bench(f"b) take [{H},128]bf16 table, 425k ids", take_small, jnp.int32(0))

    # ---- c/d: pallas VMEM-resident table gather ---------------------
    CHUNK = 8_192

    def make_vmem_gather(H, mode, chunk=CHUNK):
        def kern(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]  # [chunk] int32
            if mode == "take":
                out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)
            else:
                idxb = jnp.broadcast_to(idx[:, None], (chunk, F))
                out_ref[:] = jnp.take_along_axis(tab_ref[:], idxb, axis=0)

        def run(ids):
            n_chunks = ids.shape[0] // chunk
            return pl.pallas_call(
                kern,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (chunk, F), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((ids.shape[0], F), table.dtype),
            )(ids, table[:H])

        return run

    for H in (8_192, 16_384):
        for mode in ("take", "tala"):
            try:
                run = make_vmem_gather(H, mode)
                idsH = ids_uni % H

                def f(c, run=run, idsH=idsH):
                    out = run((idsH + (c & 0)))
                    return c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 7

                # correctness first
                got = run(idsH[: 2 * CHUNK].reshape(-1))
                want = table[:H][idsH[: 2 * CHUNK]]
                ok = bool(jnp.all(got == want))
                dt = bench(
                    f"c/d) pallas VMEM gather H={H} mode={mode} ok={ok}",
                    f, jnp.int32(0),
                )
            except Exception as e:  # noqa: BLE001
                print(f"c/d) pallas VMEM gather H={H} mode={mode} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---- e: XLA row scatter-add into a small accumulator ------------
    D = 26_624

    def scatter_add(c, ids=ids_uni):
        seg = (ids + (c & 0)) % D
        acc = jnp.zeros((D, F), jnp.float32)
        acc = acc.at[seg].add(table[ids % N].astype(jnp.float32))
        return c + jnp.sum(acc).astype(jnp.int32) % 7

    bench("e) take + scatter-add rows into [26624,128]f32", scatter_add, jnp.int32(0))

    def seg_sum(c, ids=ids_uni):
        seg = (ids + (c & 0)) % D
        rows = table[ids % N].astype(jnp.float32)
        acc = jax.ops.segment_sum(rows, seg, num_segments=D)
        return c + jnp.sum(acc).astype(jnp.int32) % 7

    bench("e2) take + segment_sum into [26624,128]f32", seg_sum, jnp.int32(0))

    # ---- f: hot coverage of real sampled final-hop ids ---------------
    from dist_gnn_tpu.dataloading import SeedGenerator
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.sampler import sample_blocks

    arrays, meta = make_synthetic_dataset(
        num_nodes=N, avg_degree=30, feature_dim=100,
        num_classes=47, train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
    counts = np.zeros(N, np.int64)
    tot = 0
    it = gen.epoch(jax.random.key(100))
    for t in range(6):
        seeds, mask = next(it)
        blocks, _ = sample_blocks(
            graph, seeds, mask, (15, 10, 5), False, jax.random.key(7 + t),
            dedup_last=False, frontier_caps=(3072, 26624, 10**9),
        )
        f_ids = np.asarray(blocks[-1].frontier)
        f_msk = np.asarray(blocks[-1].frontier_mask)
        ids = f_ids[f_msk]
        counts += np.bincount(ids, minlength=N)
        tot += ids.size
    order = np.argsort(-counts)
    csum = np.cumsum(counts[order])
    for K in (4096, 8192, 16384, 32768, 65536, 131072):
        print(f"f) top-{K:6d} nodes cover {csum[K-1]/tot*100:5.1f}% of "
              f"final-hop rows", flush=True)
    # out-degree-ranked coverage (what a static heat policy can pick)
    deg_rank = np.argsort(-np.bincount(arrays["indices"], minlength=N))
    for K in (8192, 16384, 32768, 65536):
        hot = np.zeros(N, bool)
        hot[deg_rank[:K]] = True
        print(f"f2) top-{K:6d} by in-edge appearance cover "
              f"{counts[hot].sum()/tot*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
