"""Full-graph inference in the HOST-RESIDENT regime (round-2 VERDICT #6):
features + per-layer activations in host RAM / memmap, device state bounded
by the chunk sizes — vs the device-resident layer-wise oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT, GCN, SAGE
from dist_gnn_tpu.models.inference import (
    full_graph_inference,
    full_graph_inference_host,
)


def _graph(N=500, E=6000, F=8, seed=9):
    rng = np.random.default_rng(seed)
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    return hg, feats


@pytest.mark.parametrize("model_name", ["sage", "gcn", "gat"])
def test_host_inference_matches_device_oracle(model_name, tmp_path):
    """Memmap-backed features + tiny node/edge chunks (a deliberately small
    HBM budget): slab-staged inference must equal the device-resident
    layer-wise path for ALL model families."""
    hg, feats = _graph()
    N, F = feats.shape
    mm = np.memmap(
        tmp_path / "feats.bin", dtype=np.float32, mode="w+", shape=(N, F)
    )
    mm[:] = feats

    cls = {"sage": SAGE, "gcn": GCN, "gat": GAT}[model_name]
    model = cls(F, 6, 4, 2, dropout=0.0)
    params = model.init(jax.random.key(1))

    ref = np.asarray(
        full_graph_inference(
            model, params, hg, jnp.asarray(feats), node_chunk=128,
            edge_chunk=256,
        )
    )
    # chunks far smaller than the graph → many slabs, padded tails, and
    # device state ~ 128 rows + 192 edges only
    out = full_graph_inference_host(
        model, params, hg, mm, node_chunk=128, edge_chunk=192
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_host_inference_isolated_nodes_and_uneven_tail():
    """Degree-0 rows and a final chunk smaller than node_chunk must not
    corrupt neighboring rows (padded-row scatter discipline)."""
    # 10 nodes, edges only into nodes 0..4; nodes 5..9 isolated
    src = np.array([1, 2, 3, 4, 0, 1, 2, 3], np.int64)
    dst = np.array([0, 0, 1, 1, 2, 2, 3, 4], np.int64)
    hg = HostGraph.from_coo(src, dst, 10)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((10, 5)).astype(np.float32)
    model = SAGE(5, 4, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(2))
    ref = np.asarray(
        full_graph_inference(
            model, params, hg, jnp.asarray(feats), node_chunk=4, edge_chunk=4
        )
    )
    out = full_graph_inference_host(
        model, params, hg, feats, node_chunk=4, edge_chunk=4
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
