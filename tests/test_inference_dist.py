"""Distributed full-graph inference (ring rotation) vs the single-chip
layer-wise oracle, on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GCN, SAGE
from dist_gnn_tpu.models.inference import full_graph_inference
from dist_gnn_tpu.parallel import make_mesh
from dist_gnn_tpu.parallel.inference_dist import (
    build_ring_layout,
    dist_full_graph_inference,
)


def _graph(N=700, E=9000, F=9, seed=5):
    rng = np.random.default_rng(seed)
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    return hg, feats


def test_ring_layout_covers_every_edge():
    hg, _ = _graph()
    D = 8
    S, E, srcl, dstr, valid, deg = build_ring_layout(hg, D, edge_chunk=64)
    indptr = np.asarray(hg.indptr)
    indices = np.asarray(hg.indices)
    # every (dst, src) edge appears exactly once in its device/owner bucket
    got = []
    for d in range(D):
        for o in range(D):
            v = valid[d, o]
            gsrc = srcl[d, o][v] + o * S
            gdst = dstr[d, o][v] + d * S
            got += list(zip(gdst.tolist(), gsrc.tolist()))
    want = []
    for vtx in range(hg.num_nodes):
        for s in indices[indptr[vtx] : indptr[vtx + 1]]:
            want.append((vtx, int(s)))
    assert sorted(got) == sorted(want)
    assert np.all(deg[: hg.num_nodes] == (indptr[1:] - indptr[:-1]))


def test_dist_inference_matches_single_chip_sage():
    hg, feats = _graph(seed=7)
    model = SAGE(feats.shape[1], 6, 4, 2, dropout=0.0)
    params = model.init(jax.random.key(0))
    ref = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=128, edge_chunk=256)
    )
    mesh = make_mesh(8)
    out = dist_full_graph_inference(
        model, params, hg, feats, mesh, edge_chunk=128
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dist_inference_matches_single_chip_gcn():
    hg, feats = _graph(seed=9)
    model = GCN(feats.shape[1], 5, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(1))
    ref = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=128, edge_chunk=256)
    )
    out = dist_full_graph_inference(model, params, hg, feats, edge_chunk=256)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dist_inference_two_tier_mesh_reflattens():
    """Any mesh shape works — devices are re-flattened into the ring."""
    hg, feats = _graph(N=260, E=2000, F=5, seed=3)
    model = SAGE(feats.shape[1], 4, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(2))
    mesh = make_mesh(8, axis_names=("host", "data"), hosts=2)
    out = dist_full_graph_inference(model, params, hg, feats, mesh)
    ref = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=64, edge_chunk=128)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dist_inference_matches_single_chip_gat():
    from dist_gnn_tpu.models import GAT

    hg, feats = _graph(N=400, E=5000, F=8, seed=11)
    model = GAT(feats.shape[1], 5, 3, 2, num_heads=3, dropout=0.0)
    params = model.init(jax.random.key(4))
    ref = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=128, edge_chunk=256)
    )
    out = dist_full_graph_inference(model, params, hg, feats, edge_chunk=128)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
