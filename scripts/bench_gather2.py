"""HONEST gather microbench — full consumption (jnp.sum), so XLA cannot
dead-code-eliminate chunked pallas calls (which invalidated v1's numbers:
the scalar-consumption probe kept only 1 of 17 chunk calls alive).

Compares XLA take, the multi-in-spec grid gather, and the explicit-DMA
double-buffered gather at several concurrency levels.

Run: timeout 2400 python -u scripts/bench_gather2.py > /tmp/bench_gather2.log 2>&1
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

from dist_gnn_tpu.ops import gather_pallas
from dist_gnn_tpu.utils.timing import measure_chain

N = 500_000
F = 128
L = 540_672


def main():
    print("device:", jax.devices()[0], flush=True)
    table = jax.random.normal(jax.random.key(0), (N, F), jnp.bfloat16)
    # bf16 rows can't be single-row DMA'd (sublane packing (2,1) interleaves
    # row pairs) — the DMA path gathers from an f32 copy: 512 B per row,
    # exact, still 4x less traffic than XLA take's (8,128)-tile reads
    table_f32 = table.astype(jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (L,), 0, N, jnp.int32)
    jax.block_until_ready((table, table_f32, idx))

    def bench(name, fn):
        @jax.jit
        def step(carry):
            i, acc = carry
            ids = jnp.roll(idx, i)
            out = fn(ids)
            s = jnp.sum(out.astype(jnp.float32))  # full consumption: no DCE
            return (i + 1 + (s.astype(jnp.int32) & 0), acc + s)

        try:
            dt = measure_chain(step, (jnp.int32(0), jnp.float32(0)), n_lo=3, n_hi=9, reps=3)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            return
        print(
            f"{name}: {dt*1e3:.3f} ms  {L/dt/1e6:.1f}M rows/s  "
            f"{L*F*2/dt/1e9:.1f} GB/s", flush=True,
        )

    # correctness of the DMA path on-device first
    out = gather_pallas.gather_rows_dma(table_f32, idx[:4096], rows_per_step=128)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table_f32[idx[:4096]])
    )
    print("dma correctness OK", flush=True)

    bench("xla_take_bf16", lambda ids: table[ids])
    bench("xla_take_f32 ", lambda ids: table_f32[ids])
    for b in (32, 128, 256, 512):
        bench(
            f"dma_f32_b{b:<4}", lambda ids, b=b: gather_pallas.gather_rows_dma(
                table_f32, ids, rows_per_step=b
            ).astype(jnp.bfloat16)
        )
    bench("grid_g16_bf16", lambda ids: gather_pallas.gather_rows(table, ids, group=16))


if __name__ == "__main__":
    main()
