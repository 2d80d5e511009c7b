"""Microbench: random feature-row gather variants on the real TPU chip.

The feature gather is the step's dominant cost (NOTES.md: 7.6 ms of a
14.3 ms step) and runs slice-count-bound (~70M rows/s bf16) through XLA's
gather.  This probes whether the multi-row Pallas gather
(ops/gather_pallas.gather_rows(group=G)) beats it, and at which G.

Run:  timeout 900 python -u scripts/bench_gather.py > /tmp/bench_gather.log 2>&1
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
L = 540_672  # ~the bench step's un-deduped frontier size


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.key(0)
    table = jax.random.normal(key, (N, F), jnp.bfloat16)
    idx = jax.random.randint(jax.random.key(1), (L,), 0, N, jnp.int32)
    jax.block_until_ready((table, idx))

    def bench(name, fn):
        @jax.jit
        def step(carry):
            i, acc = carry
            # rotate ids by a data-dependent amount so the chain serializes
            ids = jnp.roll(idx, i)
            out = fn(ids)
            return (i + 1 + (out[0, 0].astype(jnp.int32) & 0), acc + out[0, 0].astype(jnp.float32))

        try:
            dt = measure_chain(step, (jnp.int32(0), jnp.float32(0)), n_lo=3, n_hi=9, reps=3)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            return
        print(
            f"{name}: {dt*1e3:.3f} ms  {L/dt/1e6:.1f}M rows/s  "
            f"{L*F*2/dt/1e9:.1f} GB/s", flush=True,
        )

    bench("xla_take          ", lambda ids: table[ids])
    bench("pallas_g1         ", lambda ids: gather_pallas.gather_rows(table, ids, group=1))
    for g in (2, 4, 8, 16, 32):
        bench(f"pallas_g{g:<10}", lambda ids, g=g: gather_pallas.gather_rows(table, ids, group=g))


if __name__ == "__main__":
    main()
