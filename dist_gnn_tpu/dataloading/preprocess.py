"""Dataset preprocessing: OGB → binary CSC shards + synthetic generators.

Mirrors ``python/DistGNN/dataloading/dataset_preprocess.py`` semantics:
  * CSC of the directed graph with dst-as-row (in-neighbors);
    ogbn-products is symmetrized first (:37-45), papers100M is not
    (:117-127);
  * optional per-edge sampling weights ``probs = |N(0,1)|`` (:70-71);
  * papers400M-style synthesis: k-fold replication with random inter-copy
    edge remapping + ring intra-links (:176-238).

Storage: one ``.npz``-style directory of raw ``.npy`` arrays (memmap-able,
no pickle) instead of torch ``.pt`` files.  Because this environment has no
network egress, :func:`make_synthetic_dataset` generates power-law graphs
with learnable community structure so end-to-end accuracy is testable
offline; the OGB ingestion path (:func:`process_ogb`) is exercised when a
local OGB download exists.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from dist_gnn_tpu.graph import HostGraph

_ARRAYS = ("indptr", "indices", "features", "labels", "train_idx", "valid_idx", "test_idx")
_OPTIONAL = ("probs",)


def save_dataset(root: str, name: str, arrays: Dict[str, np.ndarray], meta: Dict):
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    for k, v in arrays.items():
        np.save(os.path.join(path, f"{k}.npy"), v)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f)


def load_dataset(root: str, name: str, mmap: bool = True):
    """Counterpart of ``load_dataset.py:5-32``: returns (arrays, meta)."""
    path = os.path.join(root, name)
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    arrays = {}
    for k in _ARRAYS + _OPTIONAL:
        fp = os.path.join(path, f"{k}.npy")
        if os.path.exists(fp):
            arrays[k] = np.load(fp, mmap_mode="r" if mmap else None)
    return arrays, meta


def add_random_probs(num_edges: int, seed: int = 0) -> np.ndarray:
    """``probs = |N(0,1)|`` per edge (``dataset_preprocess.py:70-71``)."""
    return np.abs(np.random.default_rng(seed).standard_normal(num_edges)).astype(
        np.float32
    )


def make_synthetic_dataset(
    num_nodes: int = 10_000,
    avg_degree: int = 15,
    feature_dim: int = 64,
    num_classes: int = 16,
    train_frac: float = 0.1,
    with_probs: bool = False,
    seed: int = 0,
    power: float = 0.8,
):
    """Power-law community graph whose labels are *learnable from features
    and structure* (features = class centroid + noise; edges biased
    intra-community), so sampled GNN training shows real accuracy lift."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    # community assignment
    labels = rng.integers(0, num_classes, num_nodes).astype(np.int32)
    # power-law hub endpoints via inverse-CDF of a Zipf-like law (O(E),
    # avoids np.random.choice(p=...) whose CDF search took minutes at
    # papers-scale edge counts on this host)
    perm = rng.permutation(num_nodes)

    def zipf_nodes(count):
        u = rng.random(count)
        ranks = ((num_nodes ** (1 - power)) * u + (1 - u)) ** (1 / (1 - power))
        return perm[np.clip(ranks.astype(np.int64) - 1, 0, num_nodes - 1)]

    dst = zipf_nodes(num_edges)
    src = zipf_nodes(num_edges)
    # ~70% of edges stay intra-community: remap src to a same-label node
    same = rng.random(num_edges) < 0.7
    by_label = [np.flatnonzero(labels == c) for c in range(num_classes)]
    lab_dst = labels[dst]
    for c in range(num_classes):
        m = same & (lab_dst == c)
        cnt = int(m.sum())
        if cnt and len(by_label[c]):
            src[m] = by_label[c][rng.integers(0, len(by_label[c]), cnt)]
    graph = HostGraph.from_coo(src, dst, num_nodes, symmetrize=True)

    centroids = rng.standard_normal((num_classes, feature_dim)).astype(np.float32)
    features = (
        centroids[labels] + 1.5 * rng.standard_normal((num_nodes, feature_dim))
    ).astype(np.float32)

    perm = rng.permutation(num_nodes)
    n_train = int(num_nodes * train_frac)
    n_valid = int(num_nodes * 0.05)
    arrays = dict(
        indptr=np.asarray(graph.indptr),
        indices=np.asarray(graph.indices),
        features=features,
        labels=labels,
        train_idx=perm[:n_train].astype(np.int32),
        valid_idx=perm[n_train : n_train + n_valid].astype(np.int32),
        test_idx=perm[n_train + n_valid :].astype(np.int32),
    )
    if with_probs:
        arrays["probs"] = add_random_probs(graph.num_edges, seed)
    meta = dict(
        num_nodes=num_nodes,
        num_edges=graph.num_edges,
        feature_dim=feature_dim,
        num_classes=num_classes,
        name="synthetic",
    )
    return arrays, meta


def replicate_graph(
    indptr: np.ndarray, indices: np.ndarray, copies: int, seed: int = 0
):
    """papers400M-style synthesis (``dataset_preprocess.py:176-238``):
    ``copies`` disjoint copies; each copied edge is rewired to a random
    other copy with small probability, plus a ring of intra-links so the
    graph stays connected."""
    rng = np.random.default_rng(seed)
    n = len(indptr) - 1
    nnz = len(indices)
    out_src = []
    out_dst = []
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    for c in range(copies):
        src_c = indices.astype(np.int64) + c * n
        dst_c = rows + c * n
        # ~1% of edges jump to a random other copy
        jump = rng.random(nnz) < 0.01
        target_copy = rng.integers(0, copies, nnz)
        src_c = np.where(jump, indices.astype(np.int64) + target_copy * n, src_c)
        out_src.append(src_c)
        out_dst.append(dst_c)
        # ring intra-links
        ring = np.arange(n, dtype=np.int64)
        out_src.append(ring + c * n)
        out_dst.append((ring % n) + ((c + 1) % copies) * n)
    src = np.concatenate(out_src)
    dst = np.concatenate(out_dst)
    g = HostGraph.from_coo(src, dst, n * copies)
    return np.asarray(g.indptr), np.asarray(g.indices)


def process_ogb(
    ogb_root: str,
    name: str,
    out_root: str,
    with_probs: bool = False,
    dataset=None,
):
    """OGB → our layout.  Requires a pre-downloaded OGB dataset (no egress
    here); products is symmetrized, papers100M is not
    (``dataset_preprocess.py:37-45,117-127``).

    ``dataset`` injects a ``NodePropPredDataset``-shaped object
    (``dataset[0] -> (graph_dict, labels)``, ``get_idx_split()``) so the
    pipeline is testable without an OGB download (tests/test_dataset.py)."""
    if dataset is None:
        from ogb.nodeproppred import NodePropPredDataset  # optional dep

        dataset = NodePropPredDataset(name=name, root=ogb_root)
    graph_raw, labels = dataset[0]
    split = dataset.get_idx_split()
    src, dst = graph_raw["edge_index"]
    n = graph_raw["num_nodes"]
    g = HostGraph.from_coo(
        src, dst, n, symmetrize=(name == "ogbn-products")
    )
    arrays = dict(
        indptr=np.asarray(g.indptr),
        indices=np.asarray(g.indices),
        features=graph_raw["node_feat"].astype(np.float32),
        labels=np.nan_to_num(labels.reshape(-1)).astype(np.int32),
        train_idx=split["train"].astype(np.int32),
        valid_idx=split["valid"].astype(np.int32),
        test_idx=split["test"].astype(np.int32),
    )
    if with_probs:
        arrays["probs"] = add_random_probs(g.num_edges)
    meta = dict(
        num_nodes=n,
        num_edges=g.num_edges,
        feature_dim=arrays["features"].shape[1],
        num_classes=int(arrays["labels"].max()) + 1,
        name=name,
    )
    save_dataset(out_root, name, arrays, meta)
    return arrays, meta
