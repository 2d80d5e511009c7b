"""Measurement utilities that survive tunneled/remote TPU backends.

On this environment's axon-tunneled TPU, ``jax.block_until_ready`` returns
before the device has actually executed (it waits on the local handle, not
the remote completion), which silently turns naive timers into
dispatch-rate meters (we measured a "21,000 TFLOP/s matmul" before
catching it).  The honest protocol:

  * :func:`device_sync` — force completion with a tiny device→host
    readback (a real data dependency end-to-end).
  * :func:`measure_chain` — time a data-dependent chain of N steps at two
    depths and take the slope, cancelling the tunnel round-trip latency.

Validated: an 8192³ bf16 matmul measures 183 TFLOP/s with the slope
method (v5e peak ≈ 197) vs a nonsensical 21,563 TFLOP/s with
block_until_ready timing.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def device_sync(tree) -> None:
    """Wait until device work producing ``tree`` has really finished.

    Reads back one element of EVERY (non-empty) leaf: leaves may come
    from different dispatches, and a first-leaf-only readback would only
    fence that leaf's executable — the others could still be running on
    the remote device (the exact early-return failure mode this module
    exists to prevent).  The tiny slices are fetched in ONE device_get so
    the cost is one round-trip, not one per leaf.
    """
    jax.block_until_ready(tree)
    leaves = [
        leaf
        for leaf in jax.tree.leaves(tree)
        if getattr(leaf, "size", 1) != 0
    ]
    if not leaves:
        return
    jax.device_get(
        [leaf if getattr(leaf, "ndim", 0) == 0 else leaf.reshape(-1)[0]
         for leaf in leaves]
    )


def measure_chain(
    step: Callable,
    init,
    n_lo: int = 5,
    n_hi: int = 25,
    reps: int = 3,
) -> float:
    """Seconds per step of ``carry = step(carry)``, tunnel-RTT-corrected.

    ``step`` must be data-dependent on its carry so the chain cannot be
    reordered.  Returns the slope ((t_hi - t_lo) / (n_hi - n_lo)), taking
    the min over ``reps`` trials of each depth.
    """

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        carry = init
        for _ in range(n):
            carry = step(carry)
        device_sync(carry)
        return time.perf_counter() - t0

    chain(2)  # warmup / compile
    t_lo = min(chain(n_lo) for _ in range(reps))
    t_hi = min(chain(n_hi) for _ in range(reps))
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def measure_op(
    step: Callable,
    init,
    iters: int = 64,
    n_lo: int = 2,
    n_hi: int = 6,
    reps: int = 3,
    args: tuple = (),
) -> float:
    """Seconds per step for SMALL device ops (sub-~5 ms).

    ``measure_chain`` dispatches each step as its own jitted call; on the
    tunneled backend every dispatch costs ~3-7 ms of host/tunnel time, so
    chains of small ops measure the dispatch rate, not the op (probe_step14
    produced nonsense this way).  Here the step runs ``iters`` times inside
    ONE jitted ``fori_loop`` with a true carry dependence (the op cannot be
    hoisted), and the whole program — now big enough for the slope method —
    is measured with :func:`measure_chain` and divided by ``iters``.

    ``step`` must map a small carry pytree to a same-shape carry, with its
    expensive work dependent on the carry value.

    ``args``: extra (large) arrays ``step`` needs, passed as jit ARGUMENTS
    — `step(carry, *args)`.  Do NOT close over big device arrays instead:
    closure arrays become jaxpr constants and the axon remote-compile
    serializes constants into the HTTP request (>~250 MB total fails with
    HTTP 413).
    """
    looped = jax.jit(
        lambda c, *a: jax.lax.fori_loop(
            0, iters, lambda i, cc: step(cc, *a), c
        )
    )
    return measure_chain(
        lambda c: looped(c, *args), init, n_lo=n_lo, n_hi=n_hi, reps=reps
    ) / iters
