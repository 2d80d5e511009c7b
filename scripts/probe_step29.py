"""Probe: pick-select formulations over wide (L2 hub) windows.

Given win [R, 2W] fetched windows and adj [R, k] pick positions, compare:
  a. one-hot compare+mask+reduce over 2W (current _window_select_multi)
  b. two-stage hi/lo: chunk select via batched one-hot einsum (MXU) to
     [R, k, CH], then in-chunk one-hot over CH  (exact: one-hot matmul)
  c. take_along_axis (per-element gather baseline)

Shapes: R=5120, k=15, 2W=2048, CH=128.  Values are int32 ids <= 2^19
(exactly representable in f32/bf16x3 products).

Run in background; writes /tmp/probe29.log
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

R, K, W2, CH = 5120, 15, 1024, 128
TW = 2 * W2


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(0, 500_000, (R, TW)).astype(np.int32))
    adj = jnp.asarray(rng.integers(0, TW, (R, K)).astype(np.int32))
    jax.block_until_ready((win, adj))

    def bench(name, fn, iters=16, args=()):
        dt = measure_op(fn, jnp.int32(0), iters=iters, args=args)
        print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    def onehot(c, win, adj):
        a = (adj + c) % TW
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TW), 2)
        hit = w_iota == a[:, :, None]
        vals = jnp.sum(jnp.where(hit, win[:, None, :], 0), axis=2)
        return (c + jnp.sum(vals).astype(jnp.int32) % 3 + 1) % 97

    bench("one-hot over 2W (current)", onehot, args=(win, adj))

    def two_stage(c, win, adj):
        a = (adj + c) % TW
        C = TW // CH
        hi = a // CH
        lo = a % CH
        win3 = win.reshape(R, C, CH).astype(jnp.float32)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
        ohH = (c_iota == hi[:, :, None]).astype(jnp.float32)  # [R,K,C]
        out1 = jax.lax.dot_general(
            ohH, win3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [R,K,CH]
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CH), 2)
        ohL = j_iota == lo[:, :, None]
        vals = jnp.sum(jnp.where(ohL, out1, 0), axis=2).astype(jnp.int32)
        return (c + jnp.sum(vals) % 3 + 1) % 97

    bench("two-stage hi/lo (einsum chunk select)", two_stage, args=(win, adj))

    def taa(c, win, adj):
        a = (adj + c) % TW
        vals = jnp.take_along_axis(win, a, axis=1)
        return (c + jnp.sum(vals) % 3 + 1) % 97

    bench("take_along_axis", taa, args=(win, adj))

    # correctness cross-check (CPU-free, quick on device)
    a = adj
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, TW), 2)
    ref = jnp.sum(
        jnp.where(w_iota == a[:, :, None], win[:, None, :], 0), axis=2
    )
    C = TW // CH
    hi, lo = a // CH, a % CH
    win3 = win.reshape(R, C, CH).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    ohH = (c_iota == hi[:, :, None]).astype(jnp.float32)
    out1 = jax.lax.dot_general(
        ohH, win3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CH), 2)
    got = jnp.sum(
        jnp.where(j_iota == lo[:, :, None], out1, 0), axis=2
    ).astype(jnp.int32)
    print("two-stage exact:", bool(jnp.all(got == ref)), flush=True)


if __name__ == "__main__":
    main()
