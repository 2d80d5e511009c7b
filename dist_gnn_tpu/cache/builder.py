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
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-device sampling/feature heats: [D, N] each.

    Each device's heat is propagated from its own train-seed partition
    (parity with the reference, where every rank runs get_node_heat over
    its local train nids — ``node_classification.py:57``).  All D
    propagations share one streamed edge sweep per hop (get_node_heat_all),
    so planning never materialises [nnz] state and costs one pass, not D."""
    graph = hg.to_device()
    seeds = np.zeros((len(train_parts), hg.num_nodes), np.float32)
    for d, part in enumerate(train_parts):
        seeds[d, np.asarray(part)] = 1.0
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
):
    """Returns (mode, structure_hot_ids [D, Cs], feature_hot_ids [D, Cf]).

    ``capacity_bytes`` is the per-device HBM budget for both tiers combined
    (the reference sizes this from ``get_available_memory`` minus
    headroom — ``node_classification.py:73,170``)."""
    cost = cost or CostModel()
    s_heats, f_heats = compute_heats(hg, train_parts, fan_out)
    if policy == "selfish":
        plans = get_cache_nids_selfish(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost
        )
        mode = "selfish"
    elif policy == "selfless":
        plans = get_cache_nids_selfless(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost
        )
        mode = "selfless"
    else:
        mode, plans = get_cache_nids_auto(
            hg, feature_dim, s_heats, f_heats, capacity_bytes, cost
        )
    s_hot = _pad_plans([p[0] for p in plans])
    f_hot = _pad_plans([p[1] for p in plans])
    return mode, s_hot, f_hot
