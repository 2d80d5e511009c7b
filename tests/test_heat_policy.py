"""Heat propagation + cache policy vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.cache.cost_model import CostModel
from dist_gnn_tpu.cache.policy import (
    get_cache_nids_auto,
    get_cache_nids_selfish,
    get_cache_nids_selfless,
    structure_space_bytes,
)
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.ops.heat import get_node_heat


def oracle_heat(indptr, indices, train, fan_outs, probs=None):
    """Direct transcription of cache_value.py:26-53 + preprocess_heat.cu."""
    n = len(indptr) - 1
    seeds_heat = np.zeros(n)
    seeds_heat[train] = 1.0
    sampling_heat = np.zeros(n)
    frontier_heat = np.zeros(n)
    for k in reversed(fan_outs):
        frontier_heat = np.zeros(n)
        for row in range(n):
            if seeds_heat[row] <= 0:
                continue
            lo, hi = indptr[row], indptr[row + 1]
            deg = hi - lo
            if deg == 0:
                continue
            if probs is None:
                msg = min(1.0, seeds_heat[row] * k / deg)
                for e in range(lo, hi):
                    frontier_heat[indices[e]] += msg
            else:
                psum = probs[lo:hi].sum()
                for e in range(lo, hi):
                    msg = min(1.0, seeds_heat[row] * k * probs[e] / psum)
                    frontier_heat[indices[e]] += msg
        sampling_heat += seeds_heat
        seeds_heat = seeds_heat + frontier_heat
    return sampling_heat, sampling_heat + frontier_heat


def random_host_graph(n=200, e=2000, probs=False, seed=0):
    rng = np.random.default_rng(seed)
    return HostGraph.from_coo(
        rng.integers(0, n, e),
        rng.integers(0, n, e),
        n,
        probs=np.abs(rng.standard_normal(e)).astype(np.float32) if probs else None,
    )


def test_heat_uniform_matches_oracle():
    hg = random_host_graph()
    train = np.arange(0, 200, 7)
    s, f = get_node_heat(hg.to_device(), jnp.asarray(train), [5, 10])
    so, fo = oracle_heat(hg.indptr, hg.indices, train, [5, 10])
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f), fo, rtol=1e-5)


def test_heat_bias_matches_oracle():
    hg = random_host_graph(probs=True)
    train = np.arange(0, 200, 11)
    s, f = get_node_heat(hg.to_device(), jnp.asarray(train), [4, 6])
    so, fo = oracle_heat(hg.indptr, hg.indices, train, [4, 6], probs=hg.probs)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f), fo, rtol=1e-4)


def test_heat_streamed_chunking_matches_oracle():
    """Multi-chunk streamed path (chunk << nnz, with tail padding) must be
    identical to the single-chunk path and the oracle."""
    from dist_gnn_tpu.ops.heat import get_node_heat_all

    hg = random_host_graph(n=150, e=1777, seed=3)
    train = np.arange(0, 150, 5)
    seeds = np.zeros((1, 150), np.float32)
    seeds[0, train] = 1.0
    g = hg.to_device()
    s, f = get_node_heat_all(g, jnp.asarray(seeds), [5, 10], chunk=256)
    so, fo = oracle_heat(hg.indptr, hg.indices, train, [5, 10])
    np.testing.assert_allclose(np.asarray(s[0]), so, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f[0]), fo, rtol=1e-5)


def test_heat_multi_device_single_sweep():
    """get_node_heat_all([D, N]) == D independent get_node_heat runs."""
    from dist_gnn_tpu.ops.heat import get_node_heat, get_node_heat_all

    hg = random_host_graph(n=120, e=900, probs=True, seed=4)
    g = hg.to_device()
    parts = [np.arange(0, 120, 3), np.arange(1, 120, 4), np.arange(2, 120, 7)]
    seeds = np.zeros((3, 120), np.float32)
    for d, p in enumerate(parts):
        seeds[d, p] = 1.0
    s_all, f_all = get_node_heat_all(g, jnp.asarray(seeds), [4, 6], chunk=128)
    for d, p in enumerate(parts):
        s, f = get_node_heat(g, jnp.asarray(p), [4, 6])
        np.testing.assert_allclose(np.asarray(s_all[d]), np.asarray(s), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(f_all[d]), np.asarray(f), rtol=1e-4)


def test_heat_int64_indptr_path():
    """The streamed row derivation must work with an int64 indptr (the
    dtype graphs with >= 2^31 edges get — graph.py _min_indptr_dtype)."""
    from dist_gnn_tpu.graph import Graph
    from dist_gnn_tpu.ops.heat import get_node_heat

    hg = random_host_graph(n=80, e=640, seed=5)
    g64 = Graph(
        indptr=jnp.asarray(hg.indptr, jnp.int64),
        indices=jnp.asarray(hg.indices),
        probs=None,
        num_nodes=hg.num_nodes,
        num_edges=hg.num_edges,
        max_degree=hg.max_degree,
    )
    train = np.arange(0, 80, 9)
    s64, f64 = get_node_heat(g64, jnp.asarray(train), [3, 5])
    so, fo = oracle_heat(hg.indptr, hg.indices, train, [3, 5])
    np.testing.assert_allclose(np.asarray(s64), so, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f64), fo, rtol=1e-5)


class TestPolicy:
    def setup_method(self):
        self.hg = random_host_graph(n=100, e=600, seed=1)
        rng = np.random.default_rng(2)
        self.s_heats = rng.random((2, 100)).astype(np.float32) * (rng.random((2, 100)) < 0.5)
        self.f_heats = rng.random((2, 100)).astype(np.float32) * (rng.random((2, 100)) < 0.6)
        self.cost = CostModel(
            bandwidth_hbm=100e9, bandwidth_ici=10e9, bandwidth_host=5e9
        )

    def test_selfish_respects_capacity_and_greedy_order(self):
        cap = 2000
        plans = get_cache_nids_selfish(
            self.hg, 16, self.s_heats, self.f_heats, cap, self.cost
        )
        f_sz = 16 * 4
        for d, (s_nids, f_nids) in enumerate(plans):
            used = structure_space_bytes(self.hg, s_nids).sum() + len(f_nids) * f_sz
            assert used <= cap
            # only hot nodes are admitted
            assert (self.s_heats[d][s_nids] > 0).all()
            assert (self.f_heats[d][f_nids] > 0).all()
            # greedy: every admitted feature value >= every rejected one
            srt = self.cost.sampling_reduced_time()
            frt = self.cost.feature_reduced_time()
            f_hot = np.flatnonzero(self.f_heats[d])
            admitted = np.isin(f_hot, f_nids)
            if admitted.any() and (~admitted).any():
                vals = self.f_heats[d][f_hot] / f_sz * frt
                s_space = structure_space_bytes(self.hg, s_nids)
                min_in = vals[admitted].min()
                max_out = vals[~admitted].max()
                # rejected candidates can only beat admitted ones marginally
                # (boundary effects of the byte-capacity cut)
                assert min_in >= max_out - 1e-12 or used > cap - f_sz

    def test_selfless_dedups_owners(self):
        plans = get_cache_nids_selfless(
            self.hg, 16, self.s_heats, self.f_heats, 10**9, self.cost
        )
        # with unlimited capacity both devices also refill selfishly, so
        # check the *owned* partition property on a tight budget instead
        tight = get_cache_nids_selfless(
            self.hg, 16, self.s_heats, self.f_heats, 800, self.cost
        )
        s0, f0 = tight[0]
        s1, f1 = tight[1]
        # a node owned by dev0 (hotter there) shouldn't be dev1's primary pick
        for nid in np.intersect1d(f0, f1):
            pass  # overlap only possible via refill; just assert budget held
        f_sz = 16 * 4
        for s_nids, f_nids in tight:
            used = structure_space_bytes(self.hg, s_nids).sum() + len(f_nids) * f_sz
            assert used <= 800

    def test_auto_picks_max_score(self):
        mode, plans = get_cache_nids_auto(
            self.hg, 16, self.s_heats, self.f_heats, 3000, self.cost
        )
        assert mode in ("selfish", "selfless")
        assert len(plans) == 2


def test_calibrate_ici_runs_on_mesh():
    """ICI probe executes on the CPU mesh (numbers meaningless off-TPU,
    but the collective path and shapes are exercised)."""
    from dist_gnn_tpu.cache.cost_model import calibrate_ici
    from dist_gnn_tpu.parallel import make_mesh

    bw = calibrate_ici(make_mesh(), mbytes=1)
    assert bw > 0


class TestAutotune:
    def test_tuned_config_is_lossless_and_tight(self):
        """tune_sampler's budgets must hold (overflow 0) on fresh batches
        of the real sampler, while staying well under worst-case pads."""
        from dist_gnn_tpu.cache.autotune import tune_sampler_for
        from dist_gnn_tpu.dataloading import SeedGenerator
        from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
        from dist_gnn_tpu.sampler import sample_blocks

        arrays, meta = make_synthetic_dataset(
            num_nodes=20_000, avg_degree=20, feature_dim=4, num_classes=3,
            train_frac=0.3, seed=11,
        )
        hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
        fan_out = (8, 6, 4)
        cfg = tune_sampler_for(hg, arrays["train_idx"], 256, fan_out)
        w1, w2 = cfg.window
        assert 32 <= w1 < w2
        r1, r2 = cfg.big_row_budget
        assert r1 >= 256 and r2 >= 128
        # hop caps: tighter than the worst-case pad, roomier than the batch
        worst = 256
        for i, k in enumerate(reversed(fan_out)):
            if i < len(fan_out) - 1:
                assert 256 < cfg.frontier_caps[i] <= worst * (k + 1)
            worst = min(cfg.frontier_caps[i], worst * (k + 1))

        graph = hg.to_device()
        gen = SeedGenerator(arrays["train_idx"], 256, shuffle=True,
                            drop_last=True)
        it = gen.epoch(jax.random.key(5))
        for t in range(4):
            seeds, mask = next(it)
            _, stats = sample_blocks(
                graph, seeds, mask, fan_out, False, jax.random.key(70 + t),
                dedup_last=False, **cfg.sampler_kwargs(),
            )
            assert int(stats["sampler_overflow"]) == 0
            assert int(stats["frontier_overflow"]) == 0

    def test_tuned_config_biased_graph(self):
        """The same tuned budgets hold for the windowed-Gumbel biased path."""
        from dist_gnn_tpu.cache.autotune import tune_sampler_for
        from dist_gnn_tpu.dataloading import SeedGenerator
        from dist_gnn_tpu.dataloading.preprocess import (add_random_probs,
                                                         make_synthetic_dataset)
        from dist_gnn_tpu.sampler import sample_blocks

        arrays, meta = make_synthetic_dataset(
            num_nodes=8_000, avg_degree=15, feature_dim=4, num_classes=3,
            train_frac=0.3, seed=12,
        )
        hg = HostGraph(
            indptr=arrays["indptr"], indices=arrays["indices"],
            probs=add_random_probs(int(meta["num_edges"])),
        )
        cfg = tune_sampler_for(hg, arrays["train_idx"], 128, (6, 4))
        graph = hg.to_device(with_alias=True)
        gen = SeedGenerator(arrays["train_idx"], 128, shuffle=True,
                            drop_last=True)
        seeds, mask = next(gen.epoch(jax.random.key(9)))
        _, stats = sample_blocks(
            graph, seeds, mask, (6, 4), False, jax.random.key(3),
            dedup_last=False, **cfg.sampler_kwargs(),
        )
        assert int(stats["sampler_overflow"]) == 0
        assert int(stats["frontier_overflow"]) == 0
