"""Honest small-op gather matrix via measure_op (device-side fori loop).

Re-measures everything probe_step13/14 got wrong (those chains were
dispatch-bound: ~3-7 ms of tunnel cost per jitted call).

Run: timeout 2400 python -u scripts/probe_step15.py > /tmp/probe15.log 2>&1
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

from dist_gnn_tpu.utils.timing import measure_op

N = 500_000


def bench(name, fn, init, den, iters=32):
    dt = measure_op(fn, init, iters=iters)
    print(f"{name:64s} {dt*1e3:8.3f} ms  {den/dt/1e6:8.1f} M rows/s",
          flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # ---- the big feature gather (sanity: should match probe7's 4.1 ms) --
    tb16 = jnp.asarray(
        rng.standard_normal((N, 128), np.float32)
    ).astype(jnp.bfloat16)
    R = 425_984
    ids = jnp.asarray(rng.integers(0, N, size=R, dtype=np.int32))
    t8 = (tb16.astype(jnp.float32) * 32).astype(jnp.int8)
    jax.block_until_ready((tb16, ids, t8))

    def take_bf16(c):
        out = tb16[(ids + c) % N]
        return (c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 3 + 1) % 97

    bench("take bf16 [500k,128] R=425984", take_bf16, jnp.int32(0), R, iters=16)

    def take_i8(c):
        out = t8[(ids + c) % N].astype(jnp.bfloat16) * jnp.bfloat16(1 / 32)
        return (c + jnp.sum(out.astype(jnp.float32)).astype(jnp.int32) % 3 + 1) % 97

    bench("take int8 [500k,128] + dequant R=425984", take_i8, jnp.int32(0), R,
          iters=16)

    # ---- window L1 shapes ------------------------------------------
    nnz = 15_000_000
    arr = jnp.asarray(rng.integers(0, N, size=nnz, dtype=np.int32))
    W = 128
    n1 = -(-nnz // W)
    pad = n1 * W - nnz
    arr_p = jnp.concatenate([arr, jnp.zeros((pad,), jnp.int32)])
    view = arr_p.reshape(n1, W)
    B = 26_624
    r0 = jnp.asarray(rng.integers(0, n1 - 2, size=B, dtype=np.int32))
    jax.block_until_ready((view, r0))

    def two_row(c):
        rr = (r0 + c) % (n1 - 2)
        pair = jnp.stack([rr, rr + 1], axis=1)
        win = view[pair]
        return (c + jnp.sum(win).astype(jnp.int32) % 3 + 1) % 97

    bench("window L1 two-row [26624x2x128] int32", two_row, jnp.int32(0),
          2 * B)

    n2 = n1 // 2
    viewA = arr_p[: n2 * 2 * W].reshape(n2, 2 * W)
    n2b = (n1 - 1) // 2
    viewB = arr_p[W : W + n2b * 2 * W].reshape(n2b, 2 * W)
    C = jnp.concatenate([viewA, viewB], axis=0)
    jax.block_until_ready(C)

    def one_row(c):
        rr = (r0 + c) % (n1 - 2)
        row = jnp.where(rr % 2 == 0, rr // 2, n2 + (rr - 1) // 2)
        win = C[row]
        return (c + jnp.sum(win).astype(jnp.int32) % 3 + 1) % 97

    bench("window L1 one-row pair-layout [26624x256] int32", one_row,
          jnp.int32(0), 2 * B)

    # level-2: wide window over compacted hubs
    W2 = 1024
    n1b = nnz // W2
    view2 = arr_p[: n1b * W2].reshape(n1b, W2)
    R1 = 5_120
    rb = jnp.asarray(rng.integers(0, n1b - 2, size=R1, dtype=np.int32))
    jax.block_until_ready((view2, rb))

    def two_row_w2(c):
        rr = (rb + c) % (n1b - 2)
        pair = jnp.stack([rr, rr + 1], axis=1)
        win = view2[pair]
        return (c + jnp.sum(win).astype(jnp.int32) % 3 + 1) % 97

    bench("window L2 two-row [5120x2x1024] int32", two_row_w2, jnp.int32(0),
          2 * R1)

    # ---- the select/reduce parts ------------------------------------
    k = 15
    adj = jnp.asarray(rng.integers(0, 2 * W, size=(B, k), dtype=np.int32))
    win_fixed = jnp.asarray(
        rng.integers(0, 1000, size=(B, 2 * W)).astype(np.int32)
    )
    jax.block_until_ready((adj, win_fixed))

    def select_reduce(c):
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * W), 2)
        a = (adj + c) % (2 * W)
        hit = w_iota == a[:, :, None]
        v = jnp.sum(jnp.where(hit, win_fixed[:, None, :], 0), axis=2)
        return (c + jnp.sum(v) % 3 + 1) % 97

    bench("L1 select/reduce [26624,15,256]", select_reduce, jnp.int32(0),
          B * k)

    # elementwise edge gather at hop-3 scale (the windowed path's rival)
    pos = jnp.asarray(rng.integers(0, nnz, size=(B, k), dtype=np.int32))
    jax.block_until_ready(pos)

    def elementwise(c):
        p = (pos + c) % nnz
        v = arr_p[p]
        return (c + jnp.sum(v) % 3 + 1) % 97

    bench("elementwise edge gather [26624x15]", elementwise, jnp.int32(0),
          B * k)

    # hop-2 scale elementwise (3072 x 10)
    pos2 = jnp.asarray(rng.integers(0, nnz, size=(3072, 10), dtype=np.int32))
    jax.block_until_ready(pos2)

    def elementwise2(c):
        p = (pos2 + c) % nnz
        v = arr_p[p]
        return (c + jnp.sum(v) % 3 + 1) % 97

    bench("elementwise edge gather [3072x10]", elementwise2, jnp.int32(0),
          3072 * 10)

    # XLA sort at relabel scales
    ids_s = jnp.asarray(rng.integers(0, N, size=33_792, dtype=np.int32))
    jax.block_until_ready(ids_s)

    def sort_s(c):
        v = jnp.sort((ids_s + c) % N)
        return (c + v[0] % 3 + 1) % 97

    bench("XLA sort [33792] int32", sort_s, jnp.int32(0), 33_792)


if __name__ == "__main__":
    main()
