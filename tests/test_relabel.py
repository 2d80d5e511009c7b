"""unique_and_relabel golden tests vs a numpy oracle.

Semantics under test (parity with ``TensorRelabelCUDA``,
``src/sampling/cuda/tensor_relabel.cu:182-205``, adapted to static shapes):
frontier[i] == seeds[i] positionally; new unique neighbor ids packed after
slot S; every valid neighbor slot maps to the frontier position holding its
global id.
"""

import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import INVALID_ID
from dist_gnn_tpu.ops.relabel import unique_and_relabel


def run(seeds, neigh, mask):
    seeds = jnp.asarray(seeds, jnp.int32)
    neigh = jnp.asarray(neigh, jnp.int32)
    mask = jnp.asarray(mask, bool)
    out = unique_and_relabel(seeds, neigh, mask)
    return (
        np.asarray(out.frontier),
        np.asarray(out.frontier_mask),
        int(out.num_frontier),
        np.asarray(out.neigh_slots),
    )


def check_invariants(seeds, neigh, mask, frontier, fmask, num_frontier, slots):
    seeds = np.asarray(seeds)
    S = len(seeds)
    # seeds-first positional invariant
    np.testing.assert_array_equal(frontier[:S], seeds)
    # valid frontier entries are unique (ignoring padded seed slots)
    valid_ids = frontier[fmask]
    assert len(set(valid_ids.tolist())) == len(valid_ids)
    assert num_frontier == fmask.sum()
    # every valid neighbor maps to its id's position
    for i in range(neigh.shape[0]):
        for j in range(neigh.shape[1]):
            if mask[i, j]:
                pos = slots[i, j]
                assert fmask[pos]
                assert frontier[pos] == neigh[i, j], (i, j, pos)


def test_basic_dedup():
    seeds = [0, 5]
    neigh = [[1, 2, 1], [2, 0, 9]]
    mask = np.ones((2, 3), bool)
    f, fm, n, sl = run(seeds, neigh, mask)
    check_invariants(seeds, np.array(neigh), mask, f, fm, n, sl)
    # new uniques: 1, 2, 9 → num_frontier = 2 seeds + 3
    assert n == 5
    # neighbor equal to a seed (0) maps to the seed slot 0
    assert sl[1, 1] == 0
    # duplicate neighbor (1) maps to one slot
    assert sl[0, 0] == sl[0, 2]


def test_padded_seeds_and_neighbors():
    seeds = [4, INVALID_ID, 7]
    neigh = [[7, 3, INVALID_ID], [INVALID_ID] * 3, [4, 4, 100]]
    mask = np.array([[1, 1, 0], [0, 0, 0], [1, 1, 1]], bool)
    f, fm, n, sl = run(seeds, neigh, mask)
    check_invariants(seeds, np.array(neigh), mask, f, fm, n, sl)
    # valid: seeds 4,7 + new {3, 100}
    assert n == 4
    assert not fm[1]  # padded seed slot is masked
    assert sl[0, 0] == 2  # neighbor 7 → seed slot 2
    assert sl[2, 0] == 0  # neighbor 4 → seed slot 0


def test_all_invalid():
    seeds = [INVALID_ID, INVALID_ID]
    neigh = np.full((2, 2), INVALID_ID)
    mask = np.zeros((2, 2), bool)
    f, fm, n, sl = run(seeds, neigh, mask)
    assert n == 0
    assert not fm.any()


def test_large_random_vs_oracle():
    rng = np.random.default_rng(42)
    S, k = 64, 7
    seeds = rng.choice(10_000, S, replace=False).astype(np.int32)
    neigh = rng.integers(0, 10_000, (S, k)).astype(np.int32)
    mask = rng.random((S, k)) > 0.2
    neigh_in = np.where(mask, neigh, INVALID_ID)
    f, fm, n, sl = run(seeds, neigh_in, mask)
    check_invariants(seeds, neigh_in, mask, f, fm, n, sl)
    oracle_unique = set(seeds.tolist()) | set(neigh[mask].tolist())
    assert n == len(oracle_unique)
    assert set(f[fm].tolist()) == oracle_unique


def test_dense_matches_sort_variant():
    from dist_gnn_tpu.ops.relabel import unique_and_relabel_dense

    rng = np.random.default_rng(7)
    N = 5000
    for trial in range(3):
        S, k = 48, 6
        seeds_np = rng.choice(N, S, replace=False).astype(np.int32)
        seeds_np[-5:] = INVALID_ID  # padded tail
        neigh = rng.integers(0, N, (S, k)).astype(np.int32)
        mask = rng.random((S, k)) > 0.3
        neigh_in = np.where(mask, neigh, INVALID_ID).astype(np.int32)

        a = unique_and_relabel(
            jnp.asarray(seeds_np), jnp.asarray(neigh_in), jnp.asarray(mask)
        )
        b = unique_and_relabel_dense(
            jnp.asarray(seeds_np), jnp.asarray(neigh_in), jnp.asarray(mask), N
        )
        np.testing.assert_array_equal(np.asarray(a.frontier), np.asarray(b.frontier))
        np.testing.assert_array_equal(
            np.asarray(a.frontier_mask), np.asarray(b.frontier_mask)
        )
        assert int(a.num_frontier) == int(b.num_frontier)
        sa = np.asarray(a.neigh_slots)
        sb = np.asarray(b.neigh_slots)
        np.testing.assert_array_equal(sa[mask], sb[mask])


def test_grouped_gather_exact():
    from dist_gnn_tpu.ops.spmm import grouped_gather, pack_grouped

    rng = np.random.default_rng(3)
    N, F = 101, 8  # non-multiple of group
    table = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, 57), jnp.int32)
    for G in (2, 4):
        packed = pack_grouped(table, G)
        out = grouped_gather(packed, ids, G, F)
        np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]))
