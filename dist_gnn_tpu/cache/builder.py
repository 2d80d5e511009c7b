"""End-to-end cache construction: heat → policy → hot tiers.

The orchestration the reference spreads over its trainer setup
(``example/graphsage/node_classification.py:86-199``: get_node_heat →
selfish/selfless/auto policy → P2PCacheSampler/P2PCacheFeatureServer
ctors), as one call producing the ``hot_ids`` matrices consumed by
``ShardedGraph.build`` / ``ShardedFeatureStore``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.cache.cost_model import CostModel
from dist_gnn_tpu.cache.policy import (
    get_cache_nids_auto,
    get_cache_nids_selfish,
    get_cache_nids_selfless,
)
from dist_gnn_tpu.graph import HostGraph, INVALID_ID
from dist_gnn_tpu.ops.heat import get_node_heat_all


def compute_heats(
    hg: HostGraph,
    train_parts: Sequence[np.ndarray],
    fan_out: Sequence[int],
    device_budget_bytes: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-device sampling/feature heats: [D, N] each.

    Each device's heat is propagated from its own train-seed partition
    (parity with the reference, where every rank runs get_node_heat over
    its local train nids — ``node_classification.py:57``).  All D
    propagations share one streamed edge sweep per hop (get_node_heat_all),
    so planning never materialises [nnz] state and costs one pass, not D.

    ``device_budget_bytes`` caps device memory: when the CSC + [D, N]
    accumulators would exceed it, the graph is NEVER uploaded — edges
    stream from host RAM (memmap-safe) and accumulators are D-grouped
    (ops/heat.get_node_heat_all_host).  This is how a host-tier deployment
    plans its caches without first fitting the graph it cannot fit."""
    D, N = len(train_parts), hg.num_nodes
    seeds = np.zeros((D, N), np.float32)
    for d, part in enumerate(train_parts):
        seeds[d, np.asarray(part)] = 1.0
    if device_budget_bytes is not None:
        struct_bytes = (
            np.asarray(hg.indptr).nbytes
            + np.asarray(hg.indices).nbytes
            + (np.asarray(hg.probs).nbytes if hg.probs is not None else 0)
        )
        need = struct_bytes + 4 * D * N * 4
        if need > device_budget_bytes:
            from dist_gnn_tpu.ops.heat import get_node_heat_all_host

            return get_node_heat_all_host(
                hg, seeds, list(fan_out),
                device_budget_bytes=device_budget_bytes,
            )
    graph = hg.to_device()
    s, f = get_node_heat_all(graph, jnp.asarray(seeds), list(fan_out))
    return np.asarray(s), np.asarray(f)


def _pad_plans(plans, pad_to: Optional[int] = None) -> np.ndarray:
    """[(nids per device)] → [D, C] INVALID-padded matrix."""
    C = pad_to or max((len(p) for p in plans), default=1)
    C = max(C, 1)
    out = np.full((len(plans), C), INVALID_ID, np.int32)
    for d, p in enumerate(plans):
        out[d, : min(len(p), C)] = p[:C]
    return out


def build_cache_plan(
    hg: HostGraph,
    feature_dim: int,
    train_parts: Sequence[np.ndarray],
    fan_out: Sequence[int],
    capacity_bytes: int,
    policy: str = "auto",
    cost: Optional[CostModel] = None,
    device_budget_bytes: Optional[int] = None,
    hot_dtype: Optional[str] = None,  # None (f32) | 'bf16' | 'int8'
):
    """Returns (mode, structure_hot_ids [D, Cs], feature_hot_ids [D, Cf]).

    ``capacity_bytes`` is the per-device HBM budget for both tiers combined
    (the reference sizes this from ``get_available_memory`` minus
    headroom — ``node_classification.py:73,170``).  ``device_budget_bytes``
    caps the PLANNING memory: past it, heats stream from the host CSC
    (see :func:`compute_heats`) — required for host-tier deployments whose
    graph does not fit HBM."""
    cost = cost or CostModel()
    s_heats, f_heats = compute_heats(
        hg, train_parts, fan_out, device_budget_bytes=device_budget_bytes
    )
    # per-row byte cost of the FEATURE hot tier: quantized tiers store
    # more rows per byte and the knapsack should know (gather cost is
    # per-row, NOTES §6 — capacity is quantization's real win)
    frb = {
        None: None,
        "f32": None,
        "bf16": 2 * feature_dim,
        "int8": feature_dim + 4,  # ops/quantize.py packed layout
    }[hot_dtype]
    if policy == "selfish":
        plans = get_cache_nids_selfish(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost, frb
        )
        mode = "selfish"
    elif policy == "selfless":
        plans = get_cache_nids_selfless(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost, frb
        )
        mode = "selfless"
    else:
        mode, plans = get_cache_nids_auto(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost, frb
        )
    s_hot = _pad_plans([p[0] for p in plans])
    f_hot = _pad_plans([p[1] for p in plans])
    return mode, s_hot, f_hot
