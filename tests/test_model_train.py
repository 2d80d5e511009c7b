"""Model layer correctness vs numpy oracle + end-to-end training smoke.

Accuracy-parity protocol from SURVEY.md §7: per-layer allclose against a
numpy SAGEConv-mean oracle on injected fixed blocks, then end-to-end
accuracy lift on a learnable synthetic dataset.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import INVALID_ID, HostGraph
from dist_gnn_tpu.models import GAT, SAGE
from dist_gnn_tpu.ops.hashtable import SortedIdTable
from dist_gnn_tpu.sampler import Block
from dist_gnn_tpu.training import Trainer


def make_block(S, k, cap_src, seed=0, full=True):
    rng = np.random.default_rng(seed)
    seeds = np.arange(S, dtype=np.int32)
    slots = rng.integers(0, cap_src, (S, k)).astype(np.int32)
    mask = rng.random((S, k)) < (1.0 if full else 0.7)
    return Block(
        seeds=jnp.asarray(seeds),
        seed_mask=jnp.ones(S, bool),
        frontier=jnp.arange(cap_src, dtype=jnp.int32),
        frontier_mask=jnp.ones(cap_src, bool),
        num_frontier=jnp.int32(cap_src),
        neigh_slots=jnp.asarray(slots),
        neigh_mask=jnp.asarray(mask),
    )


def oracle_sage_layer(x, slots, mask, w_self, w_neigh, b, S):
    h_dst = x[:S]
    agg = np.zeros((S, x.shape[1]))
    for i in range(S):
        sel = slots[i][mask[i]]
        if len(sel):
            agg[i] = x[sel].mean(axis=0)
    return h_dst @ w_self + agg @ w_neigh + b


def test_sage_layer_matches_oracle():
    S, k, cap, F = 8, 4, 20, 6
    block = make_block(S, k, cap, full=False)
    x = np.random.default_rng(1).standard_normal((cap, F)).astype(np.float32)
    model = SAGE(in_feats=F, n_hidden=5, n_classes=3, num_layers=1, dropout=0.0)
    params = model.init(jax.random.key(0))
    out = model.apply(params, [block], jnp.asarray(x), train=False)
    p = params["layer0"]
    ref = oracle_sage_layer(
        x,
        np.asarray(block.neigh_slots),
        np.asarray(block.neigh_mask),
        np.asarray(p["w_self"]),
        np.asarray(p["w_neigh"]),
        np.asarray(p["b"]),
        S,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gat_layer_attention_sums_to_one():
    S, k, cap, F = 6, 5, 15, 8
    block = make_block(S, k, cap, seed=3, full=False)
    model = GAT(in_feats=F, n_hidden=4, n_classes=3, num_layers=1, num_heads=2)
    params = model.init(jax.random.key(1))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((cap, F)), jnp.float32)
    out = model.apply(params, [block], x, train=False)
    assert out.shape == (S, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sorted_id_table_roundtrip():
    ids = np.array([5, 1, 9, 1, 3], dtype=np.int32)
    prio = np.array([1, 0, 0, 1, 0], dtype=np.int32)
    t = SortedIdTable.build(ids, owners=np.array([0, 1, 2, 3, 4]), priority=prio)
    slots, hit = t.lookup(jnp.asarray([1, 9, 7], jnp.int32))
    assert list(np.asarray(hit)) == [True, True, False]
    assert np.asarray(slots)[0] == 1  # priority-0 copy of id 1 wins (slot 1)
    # owner table kept in build order for routing consumers (peer_hot_fetch)
    pos9 = int(np.searchsorted(np.asarray(t.sorted_ids), 9))
    assert int(np.asarray(t.owners)[pos9]) == 2


def test_end_to_end_training_learns():
    arrays, meta = make_synthetic_dataset(
        num_nodes=2000,
        avg_degree=10,
        feature_dim=16,
        num_classes=4,
        train_frac=0.3,
        seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = SAGE(meta["feature_dim"], 32, meta["num_classes"], 2, dropout=0.1)
    trainer = Trainer(model=model, fan_out=(5, 5))
    state = trainer.init_state(jax.random.key(0))
    gen = SeedGenerator(arrays["train_idx"], 128, shuffle=True)
    first_loss = last_loss = None
    for epoch in range(10):
        for seeds, mask in gen.epoch(jax.random.key(10 + epoch)):
            state, m = trainer.train_step(
                state, graph, features, labels, seeds, mask, jax.random.key(epoch)
            )
            if first_loss is None:
                first_loss = float(m["loss"])
            last_loss = float(m["loss"])
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)
    # eval accuracy well above chance (0.25)
    correct = total = 0
    vgen = SeedGenerator(arrays["valid_idx"], 128)
    for seeds, mask in vgen.epoch(jax.random.key(1)):
        c, t = trainer.eval_step(
            state.params, graph, features, labels, seeds, mask, jax.random.key(2)
        )
        correct += int(c)
        total += int(t)
    acc = correct / total
    assert acc > 0.5, acc


def test_full_graph_inference_matches_oracle():
    """Layer-wise full-neighborhood inference vs a numpy SAGE oracle."""
    from dist_gnn_tpu.models.inference import full_graph_inference

    rng = np.random.default_rng(11)
    N, E, F = 300, 3000, 8
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    model = SAGE(F, 6, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(0))

    out = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=64, edge_chunk=256)
    )

    # numpy oracle
    indptr = np.asarray(hg.indptr).astype(np.int64)
    indices = np.asarray(hg.indices)
    h = feats.astype(np.float64)
    for l in range(2):
        p = params[f"layer{l}"]
        agg = np.zeros_like(h[:, : h.shape[1]])
        agg = np.zeros((N, h.shape[1]))
        for v in range(N):
            nbrs = indices[indptr[v] : indptr[v + 1]]
            if len(nbrs):
                agg[v] = h[nbrs].mean(axis=0)
        h = (
            h @ np.asarray(p["w_self"], np.float64)
            + agg @ np.asarray(p["w_neigh"], np.float64)
            + np.asarray(p["b"], np.float64)
        )
        if l != 1:
            h = np.maximum(h, 0)
    np.testing.assert_allclose(out, h, rtol=1e-3, atol=1e-4)


def test_biased_training_with_alias_tables():
    """End-to-end Trainer on a weighted graph (alias sampler in the loop)."""
    arrays, meta = make_synthetic_dataset(
        num_nodes=1500, avg_degree=8, feature_dim=16, num_classes=4,
        train_frac=0.4, with_probs=True, seed=5,
    )
    hg = HostGraph(
        indptr=arrays["indptr"], indices=arrays["indices"], probs=arrays["probs"]
    )
    graph = hg.to_device(with_alias=True)
    assert graph.alias_prob is not None
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = SAGE(meta["feature_dim"], 24, meta["num_classes"], 2, dropout=0.0)
    trainer = Trainer(model=model, fan_out=(4, 4))
    state = trainer.init_state(jax.random.key(0))
    gen = SeedGenerator(arrays["train_idx"], 128, shuffle=True)
    losses = []
    for epoch in range(6):
        for seeds, mask in gen.epoch(jax.random.key(30 + epoch)):
            state, m = trainer.train_step(
                state, graph, features, labels, seeds, mask, jax.random.key(epoch)
            )
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_gat_end_to_end_training():
    arrays, meta = make_synthetic_dataset(
        num_nodes=1200, avg_degree=8, feature_dim=16, num_classes=4,
        train_frac=0.4, seed=6,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = GAT(meta["feature_dim"], 16, meta["num_classes"], 2, num_heads=2,
                dropout=0.0)
    trainer = Trainer(model=model, fan_out=(4, 4))
    state = trainer.init_state(jax.random.key(0))
    gen = SeedGenerator(arrays["train_idx"], 128, shuffle=True)
    losses = []
    for epoch in range(6):
        for seeds, mask in gen.epoch(jax.random.key(40 + epoch)):
            state, m = trainer.train_step(
                state, graph, features, labels, seeds, mask, jax.random.key(epoch)
            )
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_contiguous_first_equals_gather_path():
    from dist_gnn_tpu.sampler import sample_blocks

    rng = np.random.default_rng(12)
    N, E = 800, 8000
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    g = hg.to_device()
    seeds = jnp.asarray(rng.integers(0, N, 64), jnp.int32)
    blocks, _ = sample_blocks(
        g, seeds, jnp.ones(64, bool), (3, 3), False, jax.random.key(0),
        dedup_last=False,
    )
    model = SAGE(8, 8, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(1))
    x = jnp.asarray(
        rng.standard_normal((blocks[-1].frontier.shape[0], 8)), jnp.float32
    )
    rev = tuple(reversed(blocks))
    out_fast = model.apply(params, rev, x, contiguous_first=True)
    out_ref = model.apply(params, rev, x, contiguous_first=False)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )


def test_cached_feature_store_host_tier():
    """Single-chip hot-HBM + host-numpy cold tier store (UVA-miss analog)."""
    from dist_gnn_tpu.feature_server import CachedFeatureStore, HBMFeatureStore

    rng = np.random.default_rng(13)
    N, F = 400, 8
    feats = rng.standard_normal((N, F)).astype(np.float32)
    hot = rng.choice(N, 60, replace=False).astype(np.int32)
    store = CachedFeatureStore(feats, hot)
    ids = rng.integers(0, N, 100).astype(np.int32)
    mask = rng.random(100) < 0.9
    ids_in = np.where(mask, ids, INVALID_ID).astype(np.int32)
    out = np.asarray(store.get_features(jnp.asarray(ids_in), jnp.asarray(mask)))
    expect = np.where(mask[:, None], feats[np.where(mask, ids, 0)], 0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    assert 0 < store.hit_rate(ids) < 1

    plain = HBMFeatureStore(jnp.asarray(feats))
    out2 = np.asarray(plain.get_features(jnp.asarray(ids_in), jnp.asarray(mask)))
    np.testing.assert_allclose(out2, expect, rtol=1e-6)


def test_gat_full_graph_inference_matches_oracle():
    """GAT layer-wise full-neighborhood inference (online-softmax edge
    streaming) vs a numpy attention oracle."""
    from dist_gnn_tpu.models import GAT
    from dist_gnn_tpu.models.inference import full_graph_inference

    rng = np.random.default_rng(12)
    N, E, F, Hh, d = 200, 2400, 8, 3, 5
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    model = GAT(F, d, 4, 2, num_heads=Hh, dropout=0.0)
    params = model.init(jax.random.key(1))

    out = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=64, edge_chunk=128)
    )

    def leaky(x):
        return np.where(x > 0, x, 0.2 * x)

    indptr = np.asarray(hg.indptr).astype(np.int64)
    indices = np.asarray(hg.indices)
    h = feats.astype(np.float64)
    for l, (d_in, d_out, last) in enumerate(model.dims):
        p = params[f"layer{l}"]
        z = (h @ np.asarray(p["w"], np.float64)).reshape(N, Hh, d_out)
        el = np.einsum("shd,hd->sh", z, np.asarray(p["a_l"], np.float64))
        er = np.einsum("shd,hd->sh", z, np.asarray(p["a_r"], np.float64))
        agg = np.zeros((N, Hh, d_out))
        for v in range(N):
            nbrs = indices[indptr[v] : indptr[v + 1]]
            if len(nbrs) == 0:
                continue
            s = leaky(el[v][None, :] + er[nbrs])  # [deg, H]
            s = s - s.max(axis=0, keepdims=True)
            a = np.exp(s)
            a = a / a.sum(axis=0, keepdims=True)
            agg[v] = np.einsum("eh,ehd->hd", a, z[nbrs])
        if last:
            h = agg.mean(axis=1) + np.asarray(p["b"], np.float64).reshape(
                Hh, d_out
            ).mean(0)
        else:
            h = agg.reshape(N, Hh * d_out) + np.asarray(p["b"], np.float64)
            h = np.where(h > 0, h, np.expm1(h))  # elu
    np.testing.assert_allclose(out, h, rtol=2e-3, atol=2e-4)


def test_train_step_multi_matches_sequential():
    """train_step_multi(U) must be bit-identical to U sequential
    train_step calls (same key: each sub-step folds in state.step)."""
    arrays, meta = make_synthetic_dataset(
        num_nodes=1000, avg_degree=8, feature_dim=12, num_classes=3,
        train_frac=0.4, seed=1,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = SAGE(meta["feature_dim"], 16, meta["num_classes"], 2, dropout=0.0)
    trainer = Trainer(model=model, fan_out=(4, 3), dedup_last=False)
    gen = SeedGenerator(arrays["train_idx"], 64, shuffle=True, drop_last=True)
    it = gen.epoch(jax.random.key(3))
    batches = [next(it) for _ in range(3)]
    key = jax.random.key(9)

    st_seq = trainer.init_state(jax.random.key(0))
    last_m = None
    ovf = 0
    for s, mk in batches:
        st_seq, last_m = trainer.train_step(
            st_seq, graph, features, labels, s, mk, key
        )
        ovf += int(last_m["sampler_overflow"])

    st_multi = trainer.init_state(jax.random.key(0))
    seeds = jnp.stack([s for s, _ in batches])
    masks = jnp.stack([m for _, m in batches])
    st_multi, m_multi = trainer.train_step_multi(
        st_multi, graph, features, labels, seeds, masks, key
    )

    assert int(st_multi.step) == int(st_seq.step) == 3
    # same math, different XLA fusion → float-noise tolerance only
    for a, b in zip(jax.tree.leaves(st_seq.params), jax.tree.leaves(st_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        float(m_multi["loss"]), float(last_m["loss"]), rtol=1e-6
    )
    assert int(m_multi["sampler_overflow"]) == ovf


def test_raw_gather_matches_masked_gather():
    """zero_invalid_rows=False (skip the post-gather zeroing) must give the
    same loss/metrics/updates: every invalid frontier slot is masked by its
    consumer (gather_mean / contiguous mean / seed_mask at the loss)."""
    arrays, meta = make_synthetic_dataset(
        num_nodes=1500, avg_degree=9, feature_dim=10, num_classes=3,
        train_frac=0.3, seed=5,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = SAGE(meta["feature_dim"], 16, meta["num_classes"], 2, dropout=0.0)
    # padded batch (drop_last=False ⇒ final batch has seed_mask=False slots)
    # + tight frontier caps ⇒ dropped-entry invalid slots exercise the path
    n = int(arrays["train_idx"].shape[0])
    seeds = jnp.asarray(
        np.concatenate([arrays["train_idx"][: 96], np.full(32, 0)]).astype(np.int32)
    )
    mask = jnp.asarray(np.arange(128) < 96)
    for dedup_last in (False, True):
        kw = dict(fan_out=(4, 3), dedup_last=dedup_last,
                  frontier_caps=(300, 10**9))
        tr_masked = Trainer(model=model, zero_invalid_rows=True, **kw)
        tr_raw = Trainer(model=model, zero_invalid_rows=False, **kw)
        st = tr_masked.init_state(jax.random.key(0))
        st_m, m_m = tr_masked.train_step(
            st, graph, features, labels, seeds, mask, jax.random.key(1)
        )
        st_r, m_r = tr_raw.train_step(
            st, graph, features, labels, seeds, mask, jax.random.key(1)
        )
        np.testing.assert_allclose(
            float(m_m["loss"]), float(m_r["loss"]), rtol=1e-6
        )
        for a, b in zip(jax.tree.leaves(st_m.params), jax.tree.leaves(st_r.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        c_m = tr_masked.eval_step(st_m.params, graph, features, labels,
                                  seeds, mask, jax.random.key(2))
        c_r = tr_raw.eval_step(st_m.params, graph, features, labels,
                               seeds, mask, jax.random.key(2))
        assert int(c_m[0]) == int(c_r[0]) and int(c_m[1]) == int(c_r[1])


def test_gcn_layer_matches_oracle():
    """GCN block layer vs a numpy oracle of the symmetric-normalised rule."""
    from dist_gnn_tpu.models import GCN

    S, k, cap, F = 8, 4, 20, 6
    block = make_block(S, k, cap, seed=4, full=False)
    x = np.random.default_rng(2).standard_normal((cap, F)).astype(np.float32)
    model = GCN(F, 5, 3, 1, dropout=0.0)
    params = model.init(jax.random.key(0))
    out = np.asarray(model.apply(params, [block], jnp.asarray(x), train=False))

    slots = np.asarray(block.neigh_slots)
    mask = np.asarray(block.neigh_mask)
    deg = mask.sum(axis=1) + 1.0
    src_deg = np.ones(cap)
    src_deg[:S] = deg
    agg = np.zeros((S, F))
    for i in range(S):
        for j in range(k):
            if mask[i, j]:
                agg[i] += x[slots[i, j]] / np.sqrt(deg[i] * src_deg[slots[i, j]])
        agg[i] += x[i] / deg[i]
    ref = agg @ np.asarray(params["layer0"]["w"]) + np.asarray(params["layer0"]["b"])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_gcn_end_to_end_training_learns():
    from dist_gnn_tpu.models import GCN

    arrays, meta = make_synthetic_dataset(
        num_nodes=1500, avg_degree=8, feature_dim=16, num_classes=4,
        train_frac=0.4, seed=6,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    features = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    model = GCN(meta["feature_dim"], 24, meta["num_classes"], 2, dropout=0.0)
    for dedup_last in (True, False):
        trainer = Trainer(model=model, fan_out=(4, 4), dedup_last=dedup_last)
        state = trainer.init_state(jax.random.key(0))
        gen = SeedGenerator(arrays["train_idx"], 128, shuffle=True)
        losses = []
        for epoch in range(6):
            for seeds, mask in gen.epoch(jax.random.key(40 + epoch)):
                state, m = trainer.train_step(
                    state, graph, features, labels, seeds, mask,
                    jax.random.key(epoch),
                )
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, (dedup_last, losses[0], losses[-1])


def test_gcn_full_graph_inference_matches_oracle():
    """Layer-wise GCN inference (true degrees) vs a numpy oracle."""
    from dist_gnn_tpu.models import GCN
    from dist_gnn_tpu.models.inference import full_graph_inference

    rng = np.random.default_rng(13)
    N, E, F = 260, 2600, 7
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    feats = rng.standard_normal((N, F)).astype(np.float32)
    model = GCN(F, 6, 3, 2, dropout=0.0)
    params = model.init(jax.random.key(3))

    out = np.asarray(
        full_graph_inference(model, params, hg, jnp.asarray(feats),
                             node_chunk=48, edge_chunk=128)
    )

    indptr = np.asarray(hg.indptr).astype(np.int64)
    indices = np.asarray(hg.indices)
    deg = (indptr[1:] - indptr[:-1]).astype(np.float64)
    h = feats.astype(np.float64)
    for l in range(2):
        p = params[f"layer{l}"]
        agg = np.zeros((N, h.shape[1]))
        for v in range(N):
            nbrs = indices[indptr[v] : indptr[v + 1]]
            for u in nbrs:
                agg[v] += h[u] / np.sqrt((deg[v] + 1) * (deg[u] + 1))
            agg[v] += h[v] / (deg[v] + 1)
        h = agg @ np.asarray(p["w"], np.float64) + np.asarray(p["b"], np.float64)
        if l != 1:
            h = np.maximum(h, 0)
    np.testing.assert_allclose(out, h, rtol=1e-3, atol=1e-4)


def test_cached_feature_store_accepts_invalid_padded_plan():
    """Cache plans arrive as [C] INVALID-padded rows (cache/builder.py);
    the store must filter the padding instead of indexing the host matrix
    with int32.max (regression: IndexError in the constructor)."""
    import numpy as np

    from dist_gnn_tpu.feature_server import CachedFeatureStore
    from dist_gnn_tpu.graph import INVALID_ID

    feats = np.arange(40.0, dtype=np.float32).reshape(10, 4)
    plan = np.array([3, 7, INVALID_ID, INVALID_ID], np.int32)
    store = CachedFeatureStore(feats, plan)
    rows = store.get_features(jnp.asarray([3, 5, 7], jnp.int32))
    np.testing.assert_allclose(np.asarray(rows), feats[[3, 5, 7]])
