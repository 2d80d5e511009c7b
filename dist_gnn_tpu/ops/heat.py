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

TPU redesign: instead of launching a thread per hot seed that serially walks
its edges with AtomicAdd, we compute the per-edge message for *all* edges
(rows with zero heat contribute exactly 0) and ``segment_sum`` into source
nodes — one dense O(nnz) pass per hop, MXU/VPU-friendly, no atomics.  The
edge→row map is ``Graph.edge_rows()`` (static [nnz]).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dist_gnn_tpu.graph import Graph


@jax.jit
def frontier_heat_step(
    graph: Graph, seeds_heat: jnp.ndarray, num_picks: int | jnp.ndarray
) -> jnp.ndarray:
    """One hop of heat propagation; returns frontier_heat [num_nodes]."""
    edge_rows = graph.edge_rows()
    deg = (graph.indptr[1:] - graph.indptr[:-1]).astype(jnp.float32)
    heat_per_edge = seeds_heat[edge_rows]
    if graph.probs is not None:
        row_prob_sum = jax.ops.segment_sum(
            graph.probs, edge_rows, num_segments=graph.num_nodes
        )
        denom = jnp.where(row_prob_sum > 0, row_prob_sum, 1.0)[edge_rows]
        msg = jnp.minimum(1.0, heat_per_edge * num_picks * graph.probs / denom)
    else:
        deg_per_edge = deg[edge_rows]
        msg = jnp.minimum(1.0, heat_per_edge * num_picks / deg_per_edge)
    return jax.ops.segment_sum(
        msg, graph.indices, num_segments=graph.num_nodes
    )


def get_node_heat(
    graph: Graph, train_nids: jnp.ndarray, fan_out
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampling_heat, feature_heat), both [num_nodes] float32.

    Matches ``cache_value.py:26-53`` including the accumulation order.
    """
    seeds_heat = jnp.zeros((graph.num_nodes,), jnp.float32).at[train_nids].set(1.0)
    sampling_heat = jnp.zeros_like(seeds_heat)
    frontier_heat = jnp.zeros_like(seeds_heat)
    for k in reversed(list(fan_out)):
        frontier_heat = frontier_heat_step(graph, seeds_heat, k)
        sampling_heat = sampling_heat + seeds_heat
        seeds_heat = seeds_heat + frontier_heat
    feature_heat = sampling_heat + frontier_heat
    return sampling_heat, feature_heat
