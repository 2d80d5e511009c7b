"""Pallas TPU kernels: feature-row gather and fused gather-accumulate SpMM.

The bandwidth-critical ops of the framework (the analog of the reference's
``_IndexP2PCacheKernel`` feature gather, ``src/feature/cuda/
feature_ops.cu:38-73``, and of DGL's SAGEConv SpMM):

* :func:`gather_rows` — ``out[i] = table[idx[i]]`` as a scalar-prefetch
  pipelined kernel: the grid index_map reads the row id from SMEM and the
  Pallas pipeline double-buffers the HBM→VMEM row DMAs.
* :func:`gather_mean` — fused neighbor-mean aggregation
  ``out[i] = mean_j table[slots[i, j]]`` with an accumulating revisited
  output block: no ``[S, k, F]`` intermediate ever exists in HBM, so HBM
  traffic is 1x rows + 1x output instead of the 3x of gather-then-reduce.

Constraints honoured (see pallas_guide.md):
  * tables are viewed ``[N, 1, F]`` so the (1, 1, F) row block is legal
    (last two dims equal the array's),
  * F must be a multiple of 128 (callers pad),
  * index arrays live in SMEM → calls are chunked to ``CHUNK_IDS`` ids.

MEASURED CEILING (v5e, 540k random 256–512 B rows, honest full-consumption
timing — see scripts/bench_gather2.py): XLA's native row gather runs at
~92M rows/s regardless of row width (256 B bf16 or 512 B f32 — the rate is
per-ROW, bounded by the (8,128)-tile read per row).  Every Pallas
formulation tested loses:

  * grid-pipelined (1,1,F) blocks, 1..32 in_specs per step: 25M rows/s
    (grid-step dispatch dominates; the pipeline keeps too few row DMAs in
    flight).  CAUTION: a scalar-consumption microbench of the chunked
    variant gets 16/17 chunk calls dead-code-eliminated and reads 5–20x
    too fast — always benchmark gathers with full consumption.
  * explicit double-buffered row DMAs (``gather_rows_dma``): 62M rows/s,
    flat in concurrency (B=32 == B=128) — scalar-core DMA ISSUE RATE
    bound (~15 cycles/descriptor).  Also: bf16 tables cannot be row-DMA'd
    at all (sublane packing (2,1) interleaves row pairs; Mosaic requires
    8-row-aligned slices), so the DMA path needs an f32 copy.
  * in-kernel vector gather from a VMEM-resident table: unsupported
    (Mosaic ``dynamic_gather`` needs same-shape indices).

Conclusion: serve feature rows with ``jnp.take`` and spend optimization
effort on reducing the ROW COUNT (frontier budgets, hot tiers, dedup-free
hops), not on re-implementing the gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# max ids per pallas_call — index arrays are scalar-prefetched into SMEM
CHUNK_IDS = 32768


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gather_kernel(idx_ref, row_ref, o_ref):
    o_ref[:] = row_ref[:]


def _gather_multi_kernel(G, idx_ref, *refs):
    o_ref = refs[-1]  # (G, F) rows block — natural [L, F] layout
    for j in range(G):
        o_ref[j, :] = refs[j][0, 0, :]


@functools.partial(jax.jit, static_argnames=("G",))
def _gather_rows_multi_chunk(table3: jnp.ndarray, idx: jnp.ndarray, G: int):
    """Gather L rows with G row-DMAs in flight per grid step.

    The single-row variant is grid-step-dispatch-bound (~70M rows/s on
    v5e): each (1, 1, F) block is one ~256 B DMA and the pipeline only
    keeps 2 in flight.  Packing G independent row blocks per grid step
    (G in_specs over the same table) divides the dispatch overhead by G
    and keeps 2*G DMAs in flight.  idx length must be a multiple of G
    (callers pad with any valid id).
    """
    L = idx.shape[0]
    F = table3.shape[2]
    n = L // G

    def make_spec(j):
        return pl.BlockSpec(
            (1, 1, F), lambda i, idx_ref, j=j: (idx_ref[i * G + j], 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[make_spec(j) for j in range(G)],
        # (G, F) row blocks of a flat [L, F] output: with G=16 and bf16
        # this is exactly one native (16, 128) tile, so the consumer needs
        # no relayout (a [n, G, F] output block forced a 138 MB relayout
        # that cost ~19 ms whenever the result was consumed in full)
        out_specs=pl.BlockSpec((G, F), lambda i, idx_ref: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_gather_multi_kernel, G),
        out_shape=jax.ShapeDtypeStruct((L, F), table3.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(idx, *([table3] * G))
    return out


@functools.partial(jax.jit, static_argnames=())
def _gather_rows_chunk(table3: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    L = idx.shape[0]
    F = table3.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, 1, F), lambda i, idx_ref: (idx_ref[i], 0, 0))],
        out_specs=pl.BlockSpec((1, 1, F), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((L, 1, F), table3.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(idx, table3)
    return out[:, 0, :]


def gather_rows(
    table: jnp.ndarray, idx: jnp.ndarray, group: int = 1
) -> jnp.ndarray:
    """``table[idx]`` with a Pallas pipelined row gather.

    table [N, F] (F % 128 == 0), idx [L] int32 in [0, N).  Out-of-range ids
    must be pre-clipped by the caller (masking is the caller's business,
    matching jnp.take semantics used elsewhere).  ``group`` > 1 packs that
    many row DMAs per grid step (see ``_gather_rows_multi_chunk``).
    """
    N, F = table.shape
    assert F % 128 == 0, f"pad feature dim to 128 (got {F})"
    table3 = table.reshape(N, 1, F)
    L = idx.shape[0]
    if group > 1:
        pad = (-L) % group
        if pad:
            idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        Lp = idx.shape[0]
        if Lp <= CHUNK_IDS:
            out = _gather_rows_multi_chunk(table3, idx, group)
        else:
            step = CHUNK_IDS - CHUNK_IDS % group
            out = jnp.concatenate(
                [
                    _gather_rows_multi_chunk(table3, idx[i : i + step], group)
                    for i in range(0, Lp, step)
                ]
            )
        return out[:L] if pad else out
    if L <= CHUNK_IDS:
        return _gather_rows_chunk(table3, idx)
    chunks = [
        _gather_rows_chunk(table3, idx[i : i + CHUNK_IDS])
        for i in range(0, L, CHUNK_IDS)
    ]
    return jnp.concatenate(chunks, axis=0)


def _gather_dma_kernel(B: int, idx_ref, table_ref, o_ref, scratch, sems):
    """Explicit-DMA row gather: B row copies per grid step, double-buffered
    across steps so 2B DMAs are in flight while the previous block drains
    to the output.  This is the TPU analog of the reference's per-element
    peer/host loads inside ``_IndexP2PCacheKernel``
    (``src/feature/cuda/feature_ops.cu:38-73``) — but batched: each row is
    one async HBM->VMEM copy, latency hidden by concurrency, not warps."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def start(step, buf):
        for j in range(B):
            r = idx_ref[step * B + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1)],
                scratch.at[buf, pl.ds(j, 1)],
                sems.at[buf, j],
            ).start()

    def wait(step, buf):
        for j in range(B):
            r = idx_ref[step * B + j]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1)],
                scratch.at[buf, pl.ds(j, 1)],
                sems.at[buf, j],
            ).wait()

    @pl.when(i == 0)
    def _():
        start(i, slot)

    @pl.when(i + 1 < n)
    def _():
        start(i + 1, nxt)

    wait(i, slot)
    o_ref[:] = scratch[slot]


@functools.partial(jax.jit, static_argnames=("B",))
def _gather_rows_dma_call(table: jnp.ndarray, idx: jnp.ndarray, B: int):
    L = idx.shape[0]
    F = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L // B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((B, F), lambda i, iref: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, B, F), table.dtype),
            pltpu.SemaphoreType.DMA((2, B)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_dma_kernel, B),
        out_shape=jax.ShapeDtypeStruct((L, F), table.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(idx, table)


# ids per DMA pallas_call: the scalar-prefetched idx array lives in SMEM
# (512 KB at 131072 int32 compiles; the full 540k does not)
DMA_CHUNK_IDS = 131072


def gather_rows_dma(
    table: jnp.ndarray, idx: jnp.ndarray, rows_per_step: int = 128
) -> jnp.ndarray:
    """``table[idx]`` with explicit double-buffered row DMAs.

    table [N, F] (F % 128 == 0), idx [L] int32 in [0, N) (pre-clipped).
    ``rows_per_step`` * 2 DMAs are kept in flight.  NOTE: single-row DMAs
    require an unpacked dtype (f32/int32); bf16's (2,1) sublane packing
    interleaves row pairs, so bf16 tables must be gathered via an f32 copy.
    """
    N, F = table.shape
    assert F % 128 == 0, f"pad feature dim to 128 (got {F})"
    L = idx.shape[0]
    B = rows_per_step
    pad = (-L) % B
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    Lp = idx.shape[0]
    step = DMA_CHUNK_IDS - DMA_CHUNK_IDS % B
    if Lp <= step:
        out = _gather_rows_dma_call(table, idx, B)
    else:
        out = jnp.concatenate(
            [
                _gather_rows_dma_call(table, idx[i : i + step], B)
                for i in range(0, Lp, step)
            ]
        )
    return out[:L] if pad else out


def _gather_sum_kernel(k: int, slots_ref, row_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += row_ref[:]


@functools.partial(jax.jit, static_argnames=("k",))
def _gather_sum_chunk(table3: jnp.ndarray, flat_slots: jnp.ndarray, k: int):
    S = flat_slots.shape[0] // k
    F = table3.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, k),
        in_specs=[
            pl.BlockSpec((1, 1, F), lambda i, j, sref: (sref[i * k + j], 0, 0))
        ],
        out_specs=pl.BlockSpec((1, 1, F), lambda i, j, sref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_gather_sum_kernel, k),
        out_shape=jax.ShapeDtypeStruct((S, 1, F), table3.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(flat_slots, table3)
    return out[:, 0, :]


def gather_mean(
    h_src: jnp.ndarray,  # [cap_src, F], F % 128 == 0
    slots: jnp.ndarray,  # [S, k] int32
    mask: jnp.ndarray,  # [S, k] bool
) -> jnp.ndarray:
    """Fused masked neighbor mean (drop-in for ops.spmm.gather_mean).

    Masked slots are redirected to a zero row appended at index cap_src, so
    the kernel needs no mask; the mean divide happens outside (fused by XLA
    into the consumer matmul).
    """
    cap, F = h_src.shape
    assert F % 128 == 0, f"pad feature dim to 128 (got {F})"
    S, k = slots.shape
    table = jnp.concatenate([h_src, jnp.zeros((1, F), h_src.dtype)], axis=0)
    table3 = table.reshape(cap + 1, 1, F)
    safe_slots = jnp.where(mask, slots, cap).astype(jnp.int32).reshape(-1)

    if S * k <= CHUNK_IDS:
        sums = _gather_sum_chunk(table3, safe_slots, k)
    else:
        rows_per_chunk = max(1, CHUNK_IDS // k)
        parts = [
            _gather_sum_chunk(
                table3, safe_slots[i * k : (i + rows_per_chunk) * k], k
            )
            for i in range(0, S, rows_per_chunk)
        ]
        sums = jnp.concatenate(parts, axis=0)
    cnt = jnp.sum(mask, axis=1, dtype=h_src.dtype)[:, None]
    return sums / jnp.maximum(cnt, 1)
