"""Dataset layout save/load + papers400M-style replication."""

import numpy as np

from dist_gnn_tpu.dataloading.preprocess import (
    load_dataset,
    make_synthetic_dataset,
    replicate_graph,
    save_dataset,
)
from dist_gnn_tpu.graph import HostGraph


def test_save_load_roundtrip(tmp_path):
    arrays, meta = make_synthetic_dataset(
        num_nodes=500, avg_degree=5, feature_dim=8, num_classes=4,
        with_probs=True, seed=1,
    )
    save_dataset(str(tmp_path), "tiny", arrays, meta)
    loaded, meta2 = load_dataset(str(tmp_path), "tiny")
    assert meta2 == meta
    for k in arrays:
        np.testing.assert_array_equal(np.asarray(loaded[k]), arrays[k])


def test_replicate_graph_structure():
    """4x replication (dataset_preprocess.py:176-238 analog): copies keep
    intra-copy structure, plus ring links and a few cross-copy rewires."""
    arrays, _ = make_synthetic_dataset(
        num_nodes=300, avg_degree=4, feature_dim=4, num_classes=3, seed=2
    )
    n = 300
    copies = 4
    indptr, indices = replicate_graph(
        np.asarray(arrays["indptr"]), np.asarray(arrays["indices"]), copies
    )
    assert len(indptr) == n * copies + 1
    g = HostGraph(indptr=indptr, indices=indices)
    assert g.num_nodes == n * copies
    # edge count: copies * (orig nnz + ring links)
    orig_nnz = len(arrays["indices"])
    assert g.num_edges == copies * (orig_nnz + n)
    # most edges stay within their copy (~99% minus ring links)
    rows = np.repeat(np.arange(g.num_nodes), np.diff(indptr))
    same_copy = (rows // n) == (indices // n)
    assert same_copy.mean() > 0.7
    assert (~same_copy).sum() > 0  # some cross-copy links exist
