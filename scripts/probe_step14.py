"""Probe: XLA row-gather rate matrix — dtype x index-form x table height x
row count.  Explains the 6 M rows/s anomaly seen in probe_step13's window
gathers vs the ~80-90 M rows/s feature gathers.

Run: timeout 1800 python -u scripts/probe_step14.py > /tmp/probe14.log 2>&1
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


def bench(name, fn, init, den, reps=3):
    dt = measure_chain(fn, init, n_lo=4, n_hi=16, reps=reps)
    print(f"{name:64s} {dt*1e3:8.3f} ms  {den/dt/1e6:8.1f} M rows/s",
          flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    for H, Wd in ((117_188, 128), (117_188, 256), (500_000, 128)):
        for dt_name, dt in (("int32", jnp.int32), ("bf16", jnp.bfloat16),
                            ("f32", jnp.float32)):
            tab = jnp.asarray(
                rng.integers(0, 100, size=(H, Wd)).astype(np.float32)
            ).astype(dt)
            for B in (26_624, 106_496):
                ids = jnp.asarray(rng.integers(0, H, size=B, dtype=np.int32))
                jax.block_until_ready((tab, ids))

                def flat1d(c, tab=tab, ids=ids, H=H):
                    out = tab[(ids + (c & 0)) % H]
                    return c + jnp.sum(out.astype(jnp.float32)).astype(
                        jnp.int32) % 7

                bench(f"take {dt_name} [{H},{Wd}] B={B} flat-idx", flat1d,
                      jnp.int32(0), B)

            # 2-D pair index form (the sampler's window shape)
            B = 26_624
            r0 = jnp.asarray(rng.integers(0, H - 2, size=B, dtype=np.int32))
            jax.block_until_ready(r0)

            def pair2d(c, tab=tab, r0=r0, B=B):
                rr = r0 + (c & 0)
                pair = jnp.stack([rr, rr + 1], axis=1)
                out = tab[pair].reshape(B, -1)
                return c + jnp.sum(out.astype(jnp.float32)).astype(
                    jnp.int32) % 7

            bench(f"take {dt_name} [{H},{Wd}] B={B} pair-2d-idx", pair2d,
                  jnp.int32(0), 2 * B)

            def pairflat(c, tab=tab, r0=r0, B=B):
                rr = r0 + (c & 0)
                pair = jnp.stack([rr, rr + 1], axis=1).reshape(-1)
                out = tab[pair].reshape(B, -1)
                return c + jnp.sum(out.astype(jnp.float32)).astype(
                    jnp.int32) % 7

            bench(f"take {dt_name} [{H},{Wd}] B={B} pair-FLAT-idx", pairflat,
                  jnp.int32(0), 2 * B)


if __name__ == "__main__":
    main()
