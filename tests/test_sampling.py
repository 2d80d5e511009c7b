"""Sampler correctness: golden semantics + statistical distribution tests.

Statistical tolerance policy: empirical inclusion frequencies over T trials
are compared against expectation with ~4.5-sigma binomial bounds, so flakes
are < 1e-5 per assertion and real bias (the reference-parity property) is
caught.  The reference only eyeballed prints (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dist_gnn_tpu.graph import INVALID_ID, HostGraph
from dist_gnn_tpu.ops.sampling import sample_biased, sample_uniform


def make_graph(indptr, indices, probs=None):
    return HostGraph(
        indptr=np.asarray(indptr),
        indices=np.asarray(indices, dtype=np.int32),
        probs=None if probs is None else np.asarray(probs, dtype=np.float32),
    ).to_device()


def binom_bound(p, n, sigmas=4.5):
    return sigmas * np.sqrt(max(p * (1 - p), 1e-12) / n)


class TestUniform:
    def test_low_degree_takes_all(self, tiny_csc):
        g = make_graph(*tiny_csc)
        seeds = jnp.array([0, 1, 2], dtype=jnp.int32)
        out = sample_uniform(g, seeds, k=10, replace=False, key=jax.random.key(0))
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        # node 0 has neighbors 1,2,3,4; node 1 has [5]; node 2 none
        assert set(ids[0][mask[0]]) == {1, 2, 3, 4}
        assert mask[0].sum() == 4
        assert list(ids[1][mask[1]]) == [5]
        assert mask[2].sum() == 0
        assert (ids[~mask.astype(bool)] == INVALID_ID).all()

    def test_padded_seed_masked(self, tiny_csc):
        g = make_graph(*tiny_csc)
        seeds = jnp.array([0, INVALID_ID], dtype=jnp.int32)
        out = sample_uniform(g, seeds, k=3, replace=False, key=jax.random.key(1))
        assert np.asarray(out.mask)[1].sum() == 0

    def test_without_replacement_distinct(self, tiny_csc):
        g = make_graph(*tiny_csc)
        seeds = jnp.zeros((64,), jnp.int32) + 5  # node 5: neighbors 6..10 (deg 5)
        for t in range(8):
            out = sample_uniform(g, seeds, k=3, replace=False, key=jax.random.key(t))
            ids, mask = np.asarray(out.ids), np.asarray(out.mask)
            assert mask.all()
            for row in ids:
                assert len(set(row)) == 3, row
                assert set(row) <= set(range(6, 11))

    def test_without_replacement_uniform_marginals(self, tiny_csc):
        g = make_graph(*tiny_csc)
        T = 4000
        seeds = jnp.zeros((T,), jnp.int32) + 5  # degree 5
        k = 2
        out = sample_uniform(g, seeds, k=k, replace=False, key=jax.random.key(7))
        ids = np.asarray(out.ids)
        # NOTE: rows share one key draw per call but row_keys are iid per row.
        p = k / 5.0
        for nbr in range(6, 11):
            freq = (ids == nbr).any(axis=1).mean()
            assert abs(freq - p) < binom_bound(p, T) + 0.01, (nbr, freq)

    def test_with_replacement_marginals(self, tiny_csc):
        g = make_graph(*tiny_csc)
        T = 4000
        seeds = jnp.zeros((T,), jnp.int32)  # node 0, deg 4
        k = 8
        out = sample_uniform(g, seeds, k=k, replace=True, key=jax.random.key(3))
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask.all()
        counts = np.bincount(ids.ravel(), minlength=5)[1:5]
        p = 1 / 4.0
        freqs = counts / (T * k)
        np.testing.assert_allclose(freqs, p, atol=binom_bound(p, T * k) + 0.005)

    def test_zero_degree_row(self, tiny_csc):
        g = make_graph(*tiny_csc)
        seeds = jnp.array([3], dtype=jnp.int32)
        for replace in (False, True):
            out = sample_uniform(g, seeds, k=4, replace=replace, key=jax.random.key(0))
            assert np.asarray(out.mask).sum() == 0


class TestBiased:
    @pytest.fixture
    def weighted_graph(self):
        # one row, 6 neighbors with heavily skewed weights
        indptr = np.array([0, 6], dtype=np.int64)
        indices = np.arange(6, dtype=np.int32) + 10
        # weights sum 16
        probs = np.array([8, 4, 1, 1, 1, 1], dtype=np.float32)
        g = HostGraph(indptr=indptr, indices=indices, probs=probs)
        # fake more nodes so neighbor ids are addressable
        return make_graph(
            np.concatenate([indptr, np.full(16, 6)]), indices, probs
        )

    def test_with_replacement_matches_weights(self, weighted_graph):
        T, k = 3000, 4
        seeds = jnp.zeros((T,), jnp.int32)
        out = sample_biased(
            weighted_graph, seeds, k=k, replace=True, key=jax.random.key(11), chunk=4
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask.all()
        total = 16.0
        for i, w in enumerate([8, 4, 1, 1, 1, 1]):
            p = w / total
            freq = (ids == 10 + i).mean()
            assert abs(freq - p) < binom_bound(p, T * k) + 0.01, (i, freq, p)

    def test_without_replacement_distinct_and_ordering(self, weighted_graph):
        T, k = 2000, 3
        seeds = jnp.zeros((T,), jnp.int32)
        out = sample_biased(
            weighted_graph, seeds, k=k, replace=False, key=jax.random.key(5), chunk=4
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask.all()
        for row in ids:
            assert len(set(row)) == k
        # A-Res inclusion probabilities: heavier items appear more often.
        incl = [(ids == 10 + i).any(axis=1).mean() for i in range(6)]
        assert incl[0] > incl[1] > incl[2] - 0.03
        assert incl[0] > 0.93  # weight-8 item is almost always in top-3 of 6
        # numpy oracle for exact A-Res inclusion probability
        rngen = np.random.default_rng(0)
        w = np.array([8, 4, 1, 1, 1, 1], dtype=np.float64)
        oracle = np.zeros(6)
        O = 20000
        for _ in range(O):
            keys = rngen.random(6) ** (1 / w)
            top = np.argsort(-keys)[:k]
            oracle[top] += 1
        oracle /= O
        np.testing.assert_allclose(incl, oracle, atol=0.03)

    def test_low_degree_takes_all(self):
        indptr = np.array([0, 2, 2], dtype=np.int64)
        indices = np.array([1, 0], dtype=np.int32)
        probs = np.array([1.0, 3.0], dtype=np.float32)
        g = make_graph(indptr, indices, probs)
        out = sample_biased(g, jnp.array([0], jnp.int32), k=5, replace=False,
                            key=jax.random.key(0), chunk=8)
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask[0].sum() == 2
        assert set(ids[0][mask[0].astype(bool)]) == {0, 1}


class TestBiasedAlias:
    """Alias-table weighted sampler: distribution parity with the A-Res
    oracle (Efraimidis-Spirakis equivalence of successive weighted draws)."""

    def make(self, weights):
        d = len(weights)
        indptr = np.concatenate([[0, d], np.full(16, d)]).astype(np.int64)
        indices = (np.arange(d) + 10).astype(np.int32)
        hg = HostGraph(
            indptr=indptr,
            indices=indices,
            probs=np.asarray(weights, np.float32),
        )
        return hg.to_device(with_alias=True)

    def test_with_replacement_matches_weights(self):
        g = self.make([8, 4, 1, 1, 1, 1])
        from dist_gnn_tpu.ops.sampling import sample_biased_alias

        T, k = 3000, 4
        out = sample_biased_alias(
            g, jnp.zeros((T,), jnp.int32), k=k, replace=True, key=jax.random.key(3)
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask.all()
        for i, w in enumerate([8, 4, 1, 1, 1, 1]):
            p = w / 16.0
            freq = (ids == 10 + i).mean()
            assert abs(freq - p) < binom_bound(p, T * k) + 0.01, (i, freq, p)

    def test_without_replacement_matches_ares_oracle(self):
        w = [8, 4, 2, 1, 1, 1, 1, 1, 0.5, 0.5]  # deg 10 > 2k for k=2 -> sparse path
        g = self.make(w)
        from dist_gnn_tpu.ops.sampling import sample_biased_alias

        T, k = 4000, 2
        out = sample_biased_alias(
            g, jnp.zeros((T,), jnp.int32), k=k, replace=False, key=jax.random.key(9)
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert mask.mean() > 0.999  # shortfall must be negligible
        for row, m in zip(ids, mask):
            assert len(set(row[m])) == m.sum()
        # A-Res oracle inclusion probabilities
        rngen = np.random.default_rng(0)
        wa = np.asarray(w, np.float64)
        oracle = np.zeros(len(w))
        O = 30000
        for _ in range(O):
            keys = rngen.random(len(w)) ** (1 / wa)
            oracle[np.argsort(-keys)[:k]] += 1
        oracle /= O
        incl = [(ids == 10 + i).any(axis=1).mean() for i in range(len(w))]
        np.testing.assert_allclose(incl, oracle, atol=0.03)

    def test_dense_path_take_all_and_topk(self):
        g = self.make([1.0, 5.0, 2.0])
        from dist_gnn_tpu.ops.sampling import sample_biased_alias

        # k >= deg -> take all
        out = sample_biased_alias(
            g, jnp.zeros((4,), jnp.int32), k=5, replace=False, key=jax.random.key(0)
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        for r in range(4):
            assert set(ids[r][mask[r]]) == {10, 11, 12}


class TestWindowFetch:
    def test_window_path_identical_to_elementwise(self):
        rng = np.random.default_rng(5)
        N, E = 2000, 60000
        hg = HostGraph.from_coo(
            rng.integers(0, N, E), rng.integers(0, N, E), N
        )
        g = hg.to_device()
        seeds = jnp.asarray(rng.integers(0, N, 512), jnp.int32)
        base = sample_uniform(g, seeds, k=8, replace=False, key=jax.random.key(2))
        # sufficient budget → bit-identical to the elementwise path
        for budget in (None, 512):
            win = sample_uniform(
                g, seeds, k=8, replace=False, key=jax.random.key(2),
                window=16, big_row_budget=budget,
            )
            np.testing.assert_array_equal(np.asarray(base.ids), np.asarray(win.ids))
            np.testing.assert_array_equal(np.asarray(base.mask), np.asarray(win.mask))

    def test_two_level_window_cascade_identical_to_elementwise(self):
        """(W1, W2) cascade with sufficient budgets == exact path, incl.
        hub rows served by the wide second window."""
        rng = np.random.default_rng(51)
        N, E = 2000, 80000
        # add a few extreme hubs so all three levels are exercised
        dst = np.concatenate(
            [rng.integers(0, N, E), np.full(3000, 7), np.full(1500, 123)]
        )
        src = rng.integers(0, N, len(dst))
        hg = HostGraph.from_coo(src, dst, N)
        g = hg.to_device()
        seeds = jnp.asarray(
            np.concatenate([rng.integers(0, N, 500), [7, 123] * 6]), jnp.int32
        )
        base = sample_uniform(g, seeds, k=8, replace=False, key=jax.random.key(3))
        win = sample_uniform(
            g, seeds, k=8, replace=False, key=jax.random.key(3),
            window=(16, 256), big_row_budget=(512, 32),
        )
        assert int(win.overflow) == 0
        np.testing.assert_array_equal(np.asarray(base.ids), np.asarray(win.ids))
        np.testing.assert_array_equal(np.asarray(base.mask), np.asarray(win.mask))

    def test_two_level_window_final_budget_overflow_counted(self):
        """Rows beyond the level-2 window AND the final budget are masked
        and counted, never corrupted."""
        rng = np.random.default_rng(52)
        N = 300
        dst = np.concatenate([rng.integers(0, N, 3000)] + [
            np.full(900, h) for h in range(8)  # 8 hubs deg ~900
        ])
        src = rng.integers(0, N, len(dst))
        hg = HostGraph.from_coo(src, dst, N)
        g = hg.to_device()
        seeds = jnp.asarray(np.arange(8).repeat(4), jnp.int32)  # all hubs
        base = sample_uniform(g, seeds, k=4, replace=False, key=jax.random.key(4))
        win = sample_uniform(
            g, seeds, k=4, replace=False, key=jax.random.key(4),
            window=(8, 64), big_row_budget=(32, 2),  # final budget too small
        )
        m = np.asarray(win.mask)
        assert int(win.overflow) > 0
        np.testing.assert_array_equal(
            np.asarray(win.ids)[m], np.asarray(base.ids)[m]
        )

    def test_tight_budget_masks_not_corrupts(self):
        rng = np.random.default_rng(6)
        N, E = 500, 50000  # avg degree 100 >> window → every row is big
        hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
        g = hg.to_device()
        seeds = jnp.asarray(rng.integers(0, N, 256), jnp.int32)
        base = sample_uniform(g, seeds, k=4, replace=False, key=jax.random.key(1))
        win = sample_uniform(
            g, seeds, k=4, replace=False, key=jax.random.key(1),
            window=8, big_row_budget=32,
        )
        m = np.asarray(win.mask)
        # every still-valid slot matches the exact path; the rest is masked
        np.testing.assert_array_equal(
            np.asarray(win.ids)[m], np.asarray(base.ids)[m]
        )
        assert m.sum() < np.asarray(base.mask).sum()  # some were dropped


class TestDedupLast:
    def test_no_dedup_last_same_aggregation(self):
        """The no-dedup final hop must produce the same masked multiset of
        (seed -> neighbor feature row) pairs as the dedup path."""
        from dist_gnn_tpu.sampler import sample_blocks

        rng = np.random.default_rng(8)
        N, E = 1000, 20000
        hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
        g = hg.to_device()
        seeds = jnp.asarray(rng.integers(0, N, 64), jnp.int32)
        mask = jnp.ones(64, bool)
        for dedup in (True, False):
            blocks, _ = sample_blocks(
                g, seeds, mask, (4, 4), False, jax.random.key(0),
                dedup_last=dedup,
            )
            b = blocks[-1]
            f = np.asarray(b.frontier)
            fm = np.asarray(b.frontier_mask)
            sl = np.asarray(b.neigh_slots)
            nm = np.asarray(b.neigh_mask)
            sd = np.asarray(b.seeds)
            # resolve each neighbor slot to its global id
            resolved = [
                sorted(f[sl[i][nm[i]]].tolist())
                for i in range(len(sd))
            ]
            if dedup:
                ref = resolved
            else:
                assert resolved == ref


def test_feistel_pairwise_uniformity():
    """Pairs of distinct picks should be ~uniform over all C(d,2) pairs —
    catches structured permutations that pass marginal tests."""
    d, k, T = 12, 2, 30000
    indptr = np.array([0, d] + [d] * 20, dtype=np.int64)
    indices = np.arange(d, dtype=np.int32)
    g = make_graph(indptr, indices)
    seeds = jnp.zeros((T,), jnp.int32)
    out = sample_uniform(g, seeds, k=k, replace=False, key=jax.random.key(17))
    ids = np.sort(np.asarray(out.ids), axis=1)
    pair_idx = ids[:, 0] * d + ids[:, 1]
    counts = np.bincount(pair_idx, minlength=d * d)
    n_pairs = d * (d - 1) // 2
    expect = T / n_pairs
    observed = counts[counts > 0]
    assert len(observed) == n_pairs  # every pair occurs
    # chi-square (df = 65): ~51 measured at 8 Feistel rounds; 4 rounds gave
    # 1683 (structured pairs) — this test guards the round count
    chi2 = float(((observed - expect) ** 2 / expect).sum())
    assert chi2 < 2.0 * n_pairs, chi2


def test_alias_sparse_path_row0_not_clobbered():
    """Regression: non-taken draws used to scatter to (0, 0), overwriting
    row 0's first pick with edge offset 0.  With edge 0 given near-zero
    weight, offset 0 must remain rare in row 0 slot 0."""
    from dist_gnn_tpu.ops.sampling import sample_biased_alias

    d = 10
    w = np.full(d, 1.0, np.float32)
    w[0] = 1e-6  # edge 0 nearly never drawn legitimately
    indptr = np.concatenate([[0, d], np.full(16, d)]).astype(np.int64)
    indices = (np.arange(d) + 10).astype(np.int32)
    g = HostGraph(indptr=indptr, indices=indices, probs=w).to_device(
        with_alias=True
    )
    hits = 0
    T = 200
    for t in range(T):
        out = sample_biased_alias(
            g, jnp.zeros((1,), jnp.int32), k=2, replace=False,
            key=jax.random.key(t),
        )
        if int(np.asarray(out.ids)[0, 0]) == 10:  # neighbor of edge 0
            hits += 1
    assert hits <= 2, hits  # clobber bug made this ~always edge 0


class TestSamplerOverflowObservability:
    """ADVICE r1: undersized static budgets must be observable, not silent."""

    def test_windowed_big_row_overflow_counted(self):
        import numpy as np

        from dist_gnn_tpu.graph import HostGraph
        from dist_gnn_tpu.ops.sampling import sample_uniform

        rng = np.random.default_rng(5)
        N = 200
        # one huge hub row (degree 150 >> window) plus sparse rows
        src = np.concatenate([rng.integers(0, N, 150), rng.integers(0, N, 400)])
        dst = np.concatenate([np.zeros(150, np.int64), rng.integers(1, N, 400)])
        hg = HostGraph.from_coo(src, dst, N)
        graph = hg.to_device()
        seeds = jnp.zeros((8,), jnp.int32)  # all hit the hub
        k = 10

        exact = sample_uniform(graph, seeds, k, False, jax.random.key(0))
        lossless = sample_uniform(
            graph, seeds, k, False, jax.random.key(0), window=8,
            big_row_budget=8,
        )
        assert int(lossless.overflow) == 0
        np.testing.assert_array_equal(
            np.asarray(exact.ids), np.asarray(lossless.ids)
        )

        tight = sample_uniform(
            graph, seeds, k, False, jax.random.key(0), window=8,
            big_row_budget=2,
        )
        assert int(tight.overflow) > 0  # 6 hub rows beyond the budget
        assert int(tight.mask.sum()) < int(exact.mask.sum())

    def test_sample_blocks_stats_lossless_zero(self):
        import numpy as np

        from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
        from dist_gnn_tpu.graph import HostGraph
        from dist_gnn_tpu.sampler import sample_blocks

        arrays, meta = make_synthetic_dataset(
            num_nodes=400, avg_degree=6, feature_dim=4, num_classes=3, seed=8
        )
        hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
        graph = hg.to_device()
        seeds = jnp.asarray(arrays["train_idx"][:32])
        blocks, stats = sample_blocks(
            graph, seeds, jnp.ones((32,), bool), (4, 4), False,
            jax.random.key(1), window=16, big_row_budget=256,
        )
        assert int(stats["sampler_overflow"]) == 0
        assert int(stats["frontier_overflow"]) == 0
        # undersized frontier cap is counted
        blocks2, stats2 = sample_blocks(
            graph, seeds, jnp.ones((32,), bool), (4, 4), False,
            jax.random.key(1), frontier_caps=(40, 40),
        )
        assert int(stats2["frontier_overflow"]) > 0


class TestAliasWindowed:
    """Windowed alias fetches must be bit-identical to the elementwise
    alias path (same keys) for both replace modes, incl. hub rows."""

    def make_graph(self, seed=60, n=800, e=24000, hubs=((5, 2000), (77, 900))):
        rng = np.random.default_rng(seed)
        dst = [rng.integers(0, n, e)]
        for h, cnt in hubs:
            dst.append(np.full(cnt, h))
        dst = np.concatenate(dst)
        src = rng.integers(0, n, len(dst))
        probs = np.abs(rng.standard_normal(len(dst))).astype(np.float32) + 0.05
        hg = HostGraph.from_coo(src, dst, n, probs=probs)
        return hg.to_device(with_alias=True)

    @pytest.mark.parametrize("replace", [False, True])
    def test_windowed_matches_elementwise(self, replace):
        from dist_gnn_tpu.ops.sampling import sample_biased_alias

        g = self.make_graph()
        rng = np.random.default_rng(61)
        seeds = jnp.asarray(
            np.concatenate([rng.integers(0, 800, 300), [5, 77] * 8]), jnp.int32
        )
        base = sample_biased_alias(g, seeds, k=6, replace=replace,
                                   key=jax.random.key(9))
        win = sample_biased_alias(
            g, seeds, k=6, replace=replace, key=jax.random.key(9),
            window=(16, 512), big_row_budget=(512, 64),
        )
        assert int(win.overflow) == int(base.overflow)
        np.testing.assert_array_equal(np.asarray(base.ids), np.asarray(win.ids))
        np.testing.assert_array_equal(np.asarray(base.mask), np.asarray(win.mask))

    def test_windowed_budget_overflow_counted(self):
        from dist_gnn_tpu.ops.sampling import sample_biased_alias

        g = self.make_graph(seed=62)
        rng = np.random.default_rng(63)
        seeds = jnp.asarray(rng.integers(0, 800, 400), jnp.int32)
        win = sample_biased_alias(
            g, seeds, k=6, replace=True, key=jax.random.key(1),
            window=(8, 16), big_row_budget=(16, 2),  # way undersized
        )
        base = sample_biased_alias(g, seeds, k=6, replace=True,
                                   key=jax.random.key(1))
        m = np.asarray(win.mask)
        assert int(win.overflow) > 0
        # surviving slots match the exact draw (alias tables consulted at
        # identical positions)
        np.testing.assert_array_equal(
            np.asarray(win.ids)[m], np.asarray(base.ids)[m]
        )


def test_indptr_pairs_extents_identical():
    """with_indptr_pairs=True must produce bit-identical samples."""
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.ops.sampling import sample_uniform

    arrays, _ = make_synthetic_dataset(
        num_nodes=3000, avg_degree=20, feature_dim=4, num_classes=3,
        train_frac=0.3, seed=2,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    g_plain = hg.to_device()
    g_pairs = hg.to_device(with_indptr_pairs=True)
    assert g_pairs.indptr_pairs is not None
    seeds = jnp.asarray(np.arange(256, dtype=np.int32) * 7 % 3000)
    for window, budget in ((None, None), (16, 64), ((16, 128), (128, 16))):
        a = sample_uniform(g_plain, seeds, 8, False, jax.random.key(3),
                           window=window, big_row_budget=budget)
        b = sample_uniform(g_pairs, seeds, 8, False, jax.random.key(3),
                           window=window, big_row_budget=budget)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_window_pair_layout_identical():
    """Graph.win_pair (one-row L1 window gather) must be bit-identical to
    the two-row path, for uniform and alias-biased samplers."""
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.ops.sampling import sample_uniform, sample_biased_alias

    arrays, _ = make_synthetic_dataset(
        num_nodes=2000, avg_degree=25, feature_dim=4, num_classes=3,
        train_frac=0.3, with_probs=True, seed=7,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"],
                   probs=arrays["probs"])
    g_plain = hg.to_device(with_alias=True)
    g_pair = hg.to_device(with_alias=True, window_pair=16)
    assert g_pair.win_pair is not None
    seeds = jnp.asarray(np.arange(512, dtype=np.int32) * 3 % 2000)
    for window, budget in ((16, 64), ((16, 128), (128, 16))):
        a = sample_uniform(g_plain, seeds, 8, False, jax.random.key(3),
                           window=window, big_row_budget=budget)
        b = sample_uniform(g_pair, seeds, 8, False, jax.random.key(3),
                           window=window, big_row_budget=budget)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        # W mismatch must silently fall back to the two-row path
        c = sample_uniform(g_pair, seeds, 8, False, jax.random.key(3),
                           window=32, big_row_budget=64)
        d = sample_uniform(g_plain, seeds, 8, False, jax.random.key(3),
                           window=32, big_row_budget=64)
        np.testing.assert_array_equal(np.asarray(c.ids), np.asarray(d.ids))
    for replace in (False, True):
        a = sample_biased_alias(g_plain, seeds, 6, replace, jax.random.key(5),
                                window=16, big_row_budget=64)
        b = sample_biased_alias(g_pair, seeds, 6, replace, jax.random.key(5),
                                window=16, big_row_budget=64)
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


class TestBiasedGumbelWindowed:
    """Windowed Gumbel top-k weighted sampler (one probs/ids window fetch
    per row instead of per draw) — distribution parity with the A-Res
    oracle across all three levels (L1 window / L2 wide window / alias
    tail)."""

    def make(self, weights, pad_edges=0):
        d = len(weights)
        # row 0 has the weighted edges; optional padding edges afterwards
        # push num_edges up so windows are real
        extra = np.ones(pad_edges, np.float32)
        indptr = np.concatenate(
            [[0, d], np.linspace(d, d + pad_edges, 16).astype(np.int64)]
        ).astype(np.int64)
        indices = np.concatenate(
            [(np.arange(d) + 10), np.zeros(pad_edges)]
        ).astype(np.int32)
        hg = HostGraph(
            indptr=indptr, indices=indices,
            probs=np.concatenate([np.asarray(weights, np.float32), extra]),
        )
        return hg.to_device(with_alias=True)

    def oracle(self, w, k, O=30000):
        rngen = np.random.default_rng(0)
        wa = np.asarray(w, np.float64)
        oracle = np.zeros(len(w))
        for _ in range(O):
            keys = rngen.random(len(w)) ** (1 / wa)
            oracle[np.argsort(-keys)[:k]] += 1
        return oracle / O

    def _check(self, g, w, k, window, budget, T=4000):
        from dist_gnn_tpu.ops.sampling import sample_biased_windowed

        out = sample_biased_windowed(
            g, jnp.zeros((T,), jnp.int32), k=k, key=jax.random.key(9),
            window=window, big_row_budget=budget,
        )
        ids, mask = np.asarray(out.ids), np.asarray(out.mask)
        assert int(out.overflow) == 0
        assert mask.mean() > 0.999
        for row, m in zip(ids, mask):
            assert len(set(row[m])) == m.sum()
            assert all(10 <= x < 10 + len(w) for x in row[m])
        incl = [(ids == 10 + i).any(axis=1).mean() for i in range(len(w))]
        np.testing.assert_allclose(incl, self.oracle(w, k), atol=0.03)

    def test_level1_matches_ares_oracle(self):
        w = [8, 4, 2, 1, 1, 1, 1, 1, 0.5, 0.5]
        g = self.make(w, pad_edges=500)
        self._check(g, w, 2, window=(16, 64), budget=(64, 16))

    def test_level2_matches_ares_oracle(self):
        # deg 40 > 2*W1=16 -> every row cascades to level 2 (W2=64)
        w = list(np.linspace(8, 0.5, 40))
        g = self.make(w, pad_edges=500)
        self._check(g, w, 3, window=(8, 64), budget=(4096, 64))

    def test_tail_matches_ares_oracle(self):
        # deg 40 > 2*W2=32 -> every row goes through the alias tail
        w = list(np.linspace(8, 0.5, 40))
        g = self.make(w, pad_edges=500)
        self._check(g, w, 3, window=(8, 16), budget=(4096, 4096))

    def test_budget_overflow_counted(self):
        from dist_gnn_tpu.ops.sampling import sample_biased_windowed

        w = list(np.linspace(8, 0.5, 40))
        g = self.make(w, pad_edges=500)
        T, k = 256, 3
        out = sample_biased_windowed(
            g, jnp.zeros((T,), jnp.int32), k=k, key=jax.random.key(1),
            window=(8, 16), big_row_budget=(16, 4),  # way undersized
        )
        # all rows need the tail; only 4 slots exist -> the rest counted
        assert int(out.overflow) > 0
        served = np.asarray(out.mask).any(axis=1).sum()
        assert served <= 16  # at most R1 rows entered level 2/tail
        assert int(out.overflow) == (T - 4) * k  # (T-16)*k at L1 + (16-4)*k at L2

    def test_dispatch_via_sample_neighbors(self):
        from dist_gnn_tpu.ops.sampling import sample_neighbors

        w = [8, 4, 2, 1, 1, 1, 1, 1]
        g = self.make(w, pad_edges=500)
        out = sample_neighbors(
            g, jnp.zeros((64,), jnp.int32), 2, False, jax.random.key(2),
            window=(16, 64), big_row_budget=(64, 16),
        )
        assert np.asarray(out.mask).all()


def test_topk_hier_matches_lax_topk():
    from dist_gnn_tpu.ops.sampling import _topk_hier

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 2048)).astype(np.float32))
    v0, p0 = jax.lax.top_k(x, 15)
    v1, p1 = _topk_hier(x, 15)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # non-multiple width falls back to plain top_k
    y = x[:, :300]
    v2, p2 = _topk_hier(y, 7)
    v3, p3 = jax.lax.top_k(y, 7)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))


def test_gumbel_windowed_wide_level2_hier_topk():
    """L2 wide enough (2W2=1024) to engage the hierarchical top-k."""
    from dist_gnn_tpu.ops.sampling import sample_biased_windowed

    t = TestBiasedGumbelWindowed()
    w = list(np.linspace(8, 0.5, 40))
    g = t.make(w, pad_edges=3000)
    t._check(g, w, 3, window=(8, 512), budget=(4096, 64), T=2000)


def test_window_pair2_layout_identical():
    """Graph.win_pair2 (one-row L2 hub-window gather) must be bit-identical
    to the two-row L2 path."""
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.ops.sampling import sample_uniform

    arrays, _ = make_synthetic_dataset(
        num_nodes=2000, avg_degree=25, feature_dim=4, num_classes=3,
        train_frac=0.3, seed=9,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    g_one = hg.to_device(window_pair=16)
    g_two = hg.to_device(window_pair=(16, 128))
    assert g_two.win_pair2 is not None and g_two.win_pair2_w == 128
    seeds = jnp.asarray(np.arange(512, dtype=np.int32) * 3 % 2000)
    a = sample_uniform(g_one, seeds, 8, False, jax.random.key(5),
                       window=(16, 128), big_row_budget=(512, 256))
    b = sample_uniform(g_two, seeds, 8, False, jax.random.key(5),
                       window=(16, 128), big_row_budget=(512, 256))
    assert int(b.overflow) == 0
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    # exactness vs the plain elementwise path too
    c = sample_uniform(g_two, seeds, 8, False, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(b.ids), np.asarray(c.ids))


def test_bias_pair_combined_layout_identical():
    """The combined ids|probs pair layout (one [B, 4W] row gather per
    Gumbel level) must be bit-identical to the separate-fetch path, at
    both cascade levels, and the ids-only slice view must serve the
    uniform sampler unchanged on the same graph."""
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.ops.sampling import (
        sample_biased_windowed,
        sample_uniform,
    )

    arrays, _ = make_synthetic_dataset(
        num_nodes=3000, avg_degree=25, feature_dim=4, num_classes=3,
        train_frac=0.3, with_probs=True, seed=21,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"],
                   probs=arrays["probs"])
    g_plain = hg.to_device(with_alias=True)
    g_pair = hg.to_device(with_alias=True, window_pair=(16, 64))
    assert g_pair.win_pair_width == 2
    assert g_pair.win_pair.shape[1] == 4 * 16  # ids | probs interleaved
    assert g_pair.alias_pack is not None
    seeds = jnp.asarray(np.arange(768, dtype=np.int32) * 5 % 3000)
    for window, budget in (((16, 64), (512, 128)), ((64, 256), (256, 64))):
        a = sample_biased_windowed(
            g_plain, seeds, 6, jax.random.key(3),
            window=window, big_row_budget=budget,
        )
        b = sample_biased_windowed(
            g_pair, seeds, 6, jax.random.key(3),
            window=window, big_row_budget=budget,
        )
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        assert int(a.overflow) == int(b.overflow)
    u_pair = sample_uniform(g_pair, seeds, 6, False, jax.random.key(4),
                            window=(16, 64), big_row_budget=(512, 128))
    u_plain = sample_uniform(g_plain, seeds, 6, False, jax.random.key(4),
                             window=(16, 64), big_row_budget=(512, 128))
    np.testing.assert_array_equal(np.asarray(u_pair.ids),
                                  np.asarray(u_plain.ids))


def test_feistel_duplicate_rate_pinned():
    """Round-4 VERDICT #8: the Feistel cycle-walk's bijectivity break is a
    documented ~1e-3-probability semantics divergence from the reference's
    exactly-distinct reservoir (ops/prng.feistel_permutation).  Pin the
    rate so a permutation regression cannot silently skew sampling:

    * power-of-two domain (no cycle walk): EXACTLY bijective;
    * worst-case domain (2^n + 1, walked domain ~2d): duplicate rate over
      the full domain stays under 1e-3 per element (theory: fallback after
      12 walk steps fires with prob <= 2^-12 ~= 2.4e-4).
    """
    from dist_gnn_tpu.ops import prng

    def dup_rate(d, rows):
        j = jnp.tile(jnp.arange(d, dtype=jnp.int32)[None, :], (rows, 1))
        key = prng.random_keys(jax.random.key(7), (rows, 1))
        out = np.asarray(prng.feistel_permutation(j, jnp.int32(d), key))
        assert out.min() >= 0 and out.max() < d
        dups = sum(d - len(np.unique(out[r])) for r in range(rows))
        return dups / (rows * d)

    assert dup_rate(1024, 64) == 0.0  # exact bijection, no walk
    rate = dup_rate(1025, 512)  # worst-case walked domain
    assert rate < 1e-3, f"duplicate rate {rate} regressed past the 1e-3 bound"


def test_alias_sampler_excludes_zero_weight_edges_take_all():
    """deg <= k rows must go through the exact Gumbel path, NOT a copy-all
    shortcut: a zero-probability edge can never be a sampled neighbor
    (A-Res semantics; sample_biased/_windowed already guarantee this)."""
    indptr = np.array([0, 3], np.int64)
    indices = np.array([10, 11, 12], np.int32)
    probs = np.array([1.0, 0.0, 1.0], np.float32)
    hg = HostGraph(indptr=indptr, indices=indices, probs=probs)
    hg.build_alias_tables()
    g = hg.to_device(with_alias=True)
    from dist_gnn_tpu.ops.sampling import sample_biased_alias

    out = sample_biased_alias(
        g, jnp.zeros((1,), jnp.int32), 5, False, jax.random.key(0)
    )
    ids = np.asarray(out.ids)[0]
    mask = np.asarray(out.mask)[0]
    assert set(ids[mask].tolist()) == {10, 12}
    assert int(out.overflow) == 0
