"""Counter-based PRNG utilities for TPU samplers.

The reference seeds Philox per kernel launch from a host mt19937
(``src/context/context.h:7-20``) and draws per-thread streams inside CUDA
kernels.  The TPU design replaces *algorithmic* randomness (reservoir /
rejection loops over every neighbor) with *functional* randomness:

  * :func:`mix32` — a bijective 32-bit finalizer used as the hash everywhere.
  * :func:`feistel_permutation` — a vectorised variable-domain pseudorandom
    permutation.  ``sample k distinct of degree d`` becomes ``evaluate a
    random permutation of [0, d) at positions 0..k-1`` — O(k) work per row
    independent of d, no atomics, no data-dependent shapes.  This replaces
    the CUDA reservoir kernel (``src/sampling/cuda/rowwise_sampling.cu:47-104``).

All math is uint32; inputs/outputs are int32 for interop with indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Walk steps for cycle-walking.  Acceptance per step is >= 1/4 (domain is at
# most 4x the target when rounding bits up to even), so the miss probability
# after 24 steps is <= (3/4)**24 ~ 1e-3; misses fall back to `y % d`.
_WALK_STEPS = 24
# 8 rounds: 4 rounds leave visible pair structure at small domains
# (chi-square over C(12,2) pick-pairs: 1683 at 4 rounds, 171 at 5, 51 at 8
# with df=65) — the VPU cost of the extra rounds is negligible (<0.2 ms at
# [33792, 15]).
_FEISTEL_ROUNDS = 8
# NOTE: plain int, not jnp.uint32(...) — creating an array at import
# time initializes the JAX backend before callers can pick a platform
# (this environment's default backend is a tunneled TPU).
_GOLDEN = 0x9E3779B9


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 — a bijection on uint32, used as the universal hash."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def hash_combine(a: jnp.ndarray, b) -> jnp.ndarray:
    """Order-sensitive combiner: mix(a ^ (mix(b) + golden))."""
    b = jnp.asarray(b, dtype=jnp.uint32)
    return mix32(a.astype(jnp.uint32) ^ (mix32(b) + jnp.uint32(_GOLDEN)))


def random_keys(key: jax.Array, shape) -> jnp.ndarray:
    """Per-element uint32 subkeys from a jax PRNG key."""
    return jax.random.bits(key, shape, dtype=jnp.uint32)


def _ceil_log2(d: jnp.ndarray) -> jnp.ndarray:
    """ceil(log2(d)) for d >= 1, elementwise (uint32 in/out)."""
    d = d.astype(jnp.uint32)
    # position of highest set bit of (d - 1), + 1
    v = jnp.maximum(d, 1) - 1
    bits = jnp.zeros_like(v)
    for s in (16, 8, 4, 2, 1):
        hi = v >> s
        take = hi > 0
        bits = jnp.where(take, bits + s, bits)
        v = jnp.where(take, hi, v)
    return jnp.where(d <= 1, 0, bits + (v > 0).astype(jnp.uint32))


def _feistel(x: jnp.ndarray, half_bits: jnp.ndarray, row_key: jnp.ndarray) -> jnp.ndarray:
    """One pass of a balanced Feistel network on a 2*half_bits domain.

    ``half_bits`` may vary per element (vectorised shifts are VPU-native).
    Bijective for any round function, so the result is a true permutation of
    [0, 2**(2*half_bits)).
    """
    mask = (jnp.uint32(1) << half_bits) - jnp.uint32(1)
    lo = x & mask
    hi = (x >> half_bits) & mask
    for r in range(_FEISTEL_ROUNDS):
        f = mix32(
            lo * jnp.uint32(_GOLDEN)
            ^ (row_key + jnp.uint32((r * 0x7F4A7C15) & 0xFFFFFFFF))
        )
        hi, lo = lo, hi ^ (f & mask)
    return (hi << half_bits) | lo


def feistel_permutation(
    j: jnp.ndarray, domain: jnp.ndarray, row_key: jnp.ndarray
) -> jnp.ndarray:
    """Evaluate a keyed pseudorandom permutation of [0, domain) at position j.

    Vectorised over any shape; ``domain`` (int32/uint32, >= 1) and ``row_key``
    (uint32) broadcast against ``j``.  Distinct j < domain map to distinct
    outputs (cycle-walking preserves bijectivity; the ~1e-3-probability
    fallback ``y % domain`` can in principle collide — callers needing hard
    distinctness at tiny domains should treat it as negligible noise, which
    statistical sampling is).
    """
    j = j.astype(jnp.uint32)
    d = jnp.maximum(domain.astype(jnp.uint32), 1)
    bits = _ceil_log2(d)
    # round up to even and at least 2 so the network splits in halves
    bits = jnp.maximum(bits + (bits & 1), 2)
    half = bits >> 1

    y = _feistel(j, half, row_key)

    def body(_, y):
        y2 = _feistel(y, half, row_key)
        return jnp.where(y < d, y, y2)

    y = jax.lax.fori_loop(0, _WALK_STEPS, body, y)
    y = jnp.where(y < d, y, y % d)
    return y.astype(jnp.int32)


def uniform_mod(bits: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """bits % d with d clamped >= 1 (with-replacement draws)."""
    d = jnp.maximum(d.astype(jnp.uint32), 1)
    return (bits.astype(jnp.uint32) % d).astype(jnp.int32)


def dropout_keep(key: jax.Array, shape, keep_prob: float) -> jnp.ndarray:
    """Cheap dropout mask: one threefry draw PER ROW, mix32 per element.

    ``jax.random.bernoulli`` runs full threefry over the whole activation
    (measured 1.6 ms of the bench train step for two [26k, 256] layers);
    hashing a per-row 32-bit seed with the element index has the same
    i.i.d.-quality mask at VPU-elementwise cost.  shape is 2-D [S, H]."""
    S, H = shape
    row = random_keys(key, (S,))  # [S] uint32 (threefry, small)
    col = jax.lax.broadcasted_iota(jnp.uint32, (S, H), 1)
    bits = mix32(row[:, None] ^ (col * jnp.uint32(0x9E3779B9)))
    return bits_to_uniform(bits) < keep_prob


def bits_to_uniform(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 → float32 uniform in (0, 1): (bits >> 8) * 2**-24, nudged off 0."""
    u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2**-24)
    return jnp.maximum(u, jnp.float32(2**-25))
