"""Lossless spill rounds on every budgeted exchange (round-4 VERDICT #3).

Adversarial skew: ALL requested ids owned by a single shard with a budget
far below the per-pair load.  The reference serves every request (the
UVA/pinned-host fallback is per-element, ``feature_ops.cu:38-73``); the
spill loop must match — zero unserved, rows identical to the unbudgeted
exchange.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dist_gnn_tpu.parallel.feature_store import (
    ShardedFeatureStore,
    exchange_gather,
    exchange_gather_hier,
)


def _mesh8():
    return Mesh(np.asarray(jax.devices()[:8]), ("data",))


def _mesh2x4():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("host", "data"))


def test_flat_exchange_adversarial_skew_lossless():
    mesh = _mesh8()
    rng = np.random.default_rng(0)
    N, F = 512, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    store = ShardedFeatureStore(feats, mesh, axis_name="data")
    ss = store.shard_size  # 64
    L = 48
    # every chip asks only for shard-0 rows -> owner 0 gets 8*L requests
    ids = rng.integers(0, ss, 8 * L).astype(np.int32)
    mask = np.ones(8 * L, bool)
    budget = 6  # per-pair load is L=48 -> needs 8 spill rounds

    def body(shard, ids_, mask_):
        rows, unserved = exchange_gather(
            shard, ids_, mask_, "data", ss, budget=budget
        )
        return rows, jax.lax.psum(unserved, "data")

    rows, unserved = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )(store.features, jnp.asarray(ids), jnp.asarray(mask))
    assert int(unserved) == 0
    np.testing.assert_allclose(np.asarray(rows), feats[ids], rtol=1e-6)


def test_flat_exchange_lossy_mode_still_counts():
    mesh = _mesh8()
    rng = np.random.default_rng(1)
    N, F = 512, 4
    feats = rng.standard_normal((N, F)).astype(np.float32)
    store = ShardedFeatureStore(feats, mesh, axis_name="data")
    ss = store.shard_size
    L = 32
    ids = rng.integers(0, ss, 8 * L).astype(np.int32)
    mask = np.ones(8 * L, bool)

    def body(shard, ids_, mask_):
        rows, ovf = exchange_gather(
            shard, ids_, mask_, "data", ss, budget=4, lossless=False
        )
        return rows, jax.lax.psum(ovf, "data")

    rows, ovf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )(store.features, jnp.asarray(ids), jnp.asarray(mask))
    assert int(ovf) == 8 * (L - 4)  # everything beyond budget dropped


def test_hier_exchange_adversarial_skew_lossless():
    mesh = _mesh2x4()
    rng = np.random.default_rng(2)
    N, F = 640, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    store = ShardedFeatureStore(
        feats, mesh, axis_name=("host", "data"), hierarchical=True
    )
    ss = store.shard_size  # 80
    L = 40
    # all ids owned by chip 0 (host 0): both stages overflow
    ids = rng.integers(0, ss, 8 * L).astype(np.int32)
    mask = np.ones(8 * L, bool)

    def body(shard, ids_, mask_):
        rows, unserved = exchange_gather_hier(
            shard, ids_, mask_, "host", "data", ss,
            budget_host=5, budget_data=7,
        )
        return rows, jax.lax.psum(unserved, ("host", "data"))

    rows, unserved = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(("host", "data"), None), P(("host", "data")), P(("host", "data"))),
        out_specs=(P(("host", "data")), P()),
        check_vma=False,
    )(store.features, jnp.asarray(ids), jnp.asarray(mask))
    assert int(unserved) == 0
    np.testing.assert_allclose(np.asarray(rows), feats[ids], rtol=1e-6)


def test_store_fetch_local_skew_lossless_with_hot_tier():
    """fetch_local composes hot tier + lossless base exchange: skewed ids
    with a tiny budget still return exact rows."""
    mesh = _mesh8()
    rng = np.random.default_rng(3)
    N, F = 512, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    hot = np.full((8, 4), -1, np.int32)
    hot[:, :2] = np.asarray([[1, 2]] * 8)  # everyone caches rows 1, 2
    from dist_gnn_tpu.graph import INVALID_ID

    hot = np.where(hot < 0, INVALID_ID, hot)
    store = ShardedFeatureStore(feats, mesh, axis_name="data", hot_ids=hot)
    ss = store.shard_size
    L = 32
    ids = rng.integers(0, ss, 8 * L).astype(np.int32)  # all shard-0 owned
    mask = np.ones(8 * L, bool)

    def body(args, ids_, mask_):
        rows, unserved = store.fetch_local(args, ids_, mask_, budget=4)
        return rows, jax.lax.psum(unserved, "data")

    rows, unserved = jax.shard_map(
        body, mesh=mesh,
        in_specs=(store.shard_specs(), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )(store.shard_args(), jnp.asarray(ids), jnp.asarray(mask))
    assert int(unserved) == 0
    np.testing.assert_allclose(np.asarray(rows), feats[ids], rtol=1e-6)


def test_owner_side_sampling_adversarial_skew_lossless():
    """Sampling exchange spill rounds: all seeds owned by shard 0 with a
    tiny per-peer budget still serve EVERY seed — the full min(deg, k)
    neighbors each, all real in-neighbors (draws are position-keyed, so
    bit-identity across transport layouts is not expected)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.parallel.graph_dist import (
        ShardedGraph,
        sample_neighbors_sharded,
    )

    mesh = _mesh8()
    arrays, meta = make_synthetic_dataset(
        num_nodes=2000, avg_degree=8, feature_dim=4, num_classes=4,
        train_frac=0.5, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    sg = ShardedGraph.build(hg, mesh, axis_name="data")
    rng = np.random.default_rng(3)
    L = 32
    # every chip asks only for shard-0 rows
    seeds = rng.integers(0, sg.shard_size, 8 * L).astype(np.int32)
    mask = np.ones(8 * L, bool)

    def run(budget):
        def body(blks, s_, m_):
            indptr_blk, indices_blk, probs_blk, hot, alias = sg.unpack(blks)
            nb, ovf = sample_neighbors_sharded(
                sg, indptr_blk, indices_blk, probs_blk, s_, m_, 4, False,
                jax.random.key(7), budget=budget,
            )
            return nb.ids, nb.mask, jax.lax.psum(ovf, "data")

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(sg.shard_specs(), P("data"), P("data")),
            out_specs=(P("data"), P("data"), P()),
            check_vma=False,
        )(sg.shard_args(), jnp.asarray(seeds), jnp.asarray(mask))

    ids_tight, mask_tight, ovf_tight = run(4)  # per-pair load is 32
    ids_big, mask_big, ovf_big = run(8 * L)
    assert int(ovf_tight) == 0 and int(ovf_big) == 0
    # every seed got its full sample in BOTH runs: per-seed counts equal
    np.testing.assert_array_equal(
        np.asarray(mask_tight).sum(1), np.asarray(mask_big).sum(1)
    )
    deg = np.diff(np.asarray(arrays["indptr"]))
    np.testing.assert_array_equal(
        np.asarray(mask_tight).sum(1), np.minimum(deg[seeds], 4)
    )
    # and every sampled id is a true in-neighbor of its seed
    indptr_np = np.asarray(arrays["indptr"])
    indices_np = np.asarray(arrays["indices"])
    idt, mkt = np.asarray(ids_tight), np.asarray(mask_tight)
    for i in range(0, len(seeds), 17):
        nbrs = set(indices_np[indptr_np[seeds[i]] : indptr_np[seeds[i] + 1]])
        for j in range(4):
            if mkt[i, j]:
                assert int(idt[i, j]) in nbrs


def test_out_of_range_ids_zeroed_and_counted():
    """Masked-true ids outside the sharded table are structurally
    unservable: every exchange path must return ZERO rows for them AND a
    nonzero count — never silently-clipped real rows (module contract:
    'a nonzero count means re-tune, never silent data loss')."""
    rng = np.random.default_rng(7)
    N, F = 512, 4
    feats = rng.standard_normal((N, F)).astype(np.float32)

    # flat 8-chip mesh
    mesh = _mesh8()
    store = ShardedFeatureStore(feats, mesh, axis_name="data")
    ss = store.shard_size
    total = 8 * ss
    per = np.stack([np.array([5, total + 9, -3], np.int32)] * 8).reshape(-1)
    mask = np.ones(per.shape[0], bool)

    def body(shard, ids_, mask_):
        rows, uns = exchange_gather(shard, ids_, mask_, "data", ss)
        return rows, jax.lax.psum(uns, "data")

    rows, uns = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )(store.features, jnp.asarray(per), jnp.asarray(mask))
    rows = np.asarray(rows).reshape(8, 3, F)
    assert int(uns) == 16  # 2 bad ids per chip
    np.testing.assert_allclose(rows[:, 0], np.broadcast_to(feats[5], (8, F)))
    assert np.all(rows[:, 1:] == 0)

    # hierarchical (2, 4) mesh
    mesh2 = _mesh2x4()
    store2 = ShardedFeatureStore(
        feats, mesh2, axis_name=("host", "data"), hierarchical=True
    )
    ss2 = store2.shard_size

    def body2(shard, ids_, mask_):
        rows, uns = exchange_gather_hier(
            shard, ids_, mask_, "host", "data", ss2
        )
        return rows, jax.lax.psum(uns, ("host", "data"))

    rows2, uns2 = jax.shard_map(
        body2, mesh=mesh2,
        in_specs=(P(("host", "data"), None), P(("host", "data")),
                  P(("host", "data"))),
        out_specs=(P(("host", "data")), P()),
        check_vma=False,
    )(store2.features, jnp.asarray(per), jnp.asarray(mask))
    rows2 = np.asarray(rows2).reshape(8, 3, F)
    assert int(uns2) == 16
    np.testing.assert_allclose(rows2[:, 0], np.broadcast_to(feats[5], (8, F)))
    assert np.all(rows2[:, 1:] == 0)
