"""Probe: (1) int8 quantized feature gather rate vs bf16 (is XLA take
byte-bound or row-issue-bound?), (2) hop-3 window L1 as ONE row gather from
a pair-layout (two 2W-aligned reshapes concatenated) vs the current two-row
gather.

Run: timeout 1800 python -u scripts/probe_step13.py > /tmp/probe13.log 2>&1
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

from dist_gnn_tpu.utils.timing import measure_chain

N = 500_000
F = 128
R = 425_984


def bench(name, fn, init, den=R, reps=3):
    dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=reps)
    print(f"{name:56s} {dt*1e3:8.3f} ms  {den/dt/1e6:8.1f} M rows/s",
          flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, size=R, dtype=np.int32))
    table = jax.random.normal(jax.random.key(0), (N, F), jnp.float32)
    tb16 = table.astype(jnp.bfloat16)
    t8 = jnp.clip(table * 32.0, -127, 127).astype(jnp.int8)
    scale = jnp.float32(1 / 32.0)
    jax.block_until_ready((ids, tb16, t8))

    def take_bf16(c):
        out = tb16[(ids + (c & 0)) % N]
        return c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 7

    bench("take bf16 [500k,128]", take_bf16, jnp.int32(0))

    def take_i8(c):
        out = t8[(ids + (c & 0)) % N]
        o = out.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
        return c + jnp.sum(o.astype(jnp.float32)).astype(jnp.int32) % 7

    bench("take int8 [500k,128] + dequant", take_i8, jnp.int32(0))

    t8w = jnp.concatenate([t8, t8, t8, t8], axis=1)  # [500k, 512] int8

    def take_i8_512(c):
        out = t8w[(ids + (c & 0)) % N]
        return c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 7

    bench("take int8 [500k,512] (4 rows packed)", take_i8_512, jnp.int32(0))

    # ---- hop-3 window L1: pair layout --------------------------------
    nnz = 15_000_000
    arr = jnp.asarray(rng.integers(0, N, size=nnz, dtype=np.int32))
    B = 26_624
    W = 128
    n1 = -(-nnz // W)
    pad = n1 * W - nnz
    arr_p = jnp.concatenate([arr, jnp.zeros((pad,), jnp.int32)])
    start = jnp.asarray(
        rng.integers(0, nnz - 4 * W, size=B, dtype=np.int32)
    )
    r0 = jnp.clip(start // W, 0, n1 - 2)

    view = arr_p.reshape(n1, W)

    def two_row(c):
        rr = (r0 + (c & 0))
        pair = jnp.stack([rr, rr + 1], axis=1)  # [B, 2]
        win = view[pair].reshape(B, 2 * W)
        return c + jnp.sum(win).astype(jnp.int32) % 7

    bench("window L1 two-row gather [26624 x 2 x 128]", two_row,
          jnp.int32(0), den=B)

    # pair layout: two 2W-aligned views concatenated
    n2 = n1 // 2
    viewA = arr_p[: n2 * 2 * W].reshape(n2, 2 * W)
    n2b = (n1 - 1) // 2
    viewB = arr_p[W : W + n2b * 2 * W].reshape(n2b, 2 * W)
    C = jnp.concatenate([viewA, viewB], axis=0)
    jax.block_until_ready(C)

    def one_row(c):
        rr = r0 + (c & 0)
        row = jnp.where(rr % 2 == 0, rr // 2, n2 + (rr - 1) // 2)
        win = C[row]
        return c + jnp.sum(win).astype(jnp.int32) % 7

    # correctness
    got = np.asarray(C[jnp.where(r0 % 2 == 0, r0 // 2, n2 + (r0 - 1) // 2)])
    want = np.asarray(view[jnp.stack([r0, r0 + 1], 1)].reshape(B, 2 * W))
    print("pair-layout correctness:", bool((got == want).all()), flush=True)
    bench("window L1 ONE-row gather (pair layout)", one_row,
          jnp.int32(0), den=B)


if __name__ == "__main__":
    main()
