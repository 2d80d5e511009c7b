"""Pallas gather kernels (interpret mode on CPU) + frontier-cap truncation."""

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import INVALID_ID, HostGraph
from dist_gnn_tpu.ops import spmm
from dist_gnn_tpu.ops.gather_pallas import gather_mean, gather_rows


def test_pallas_gather_rows_matches_take():
    rng = np.random.default_rng(0)
    N, F, L = 64, 128, 40
    table = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, L), jnp.int32)
    out = gather_rows(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]))


def test_pallas_gather_rows_multi_matches_take():
    """Grouped gather (G row DMAs per grid step), incl. the non-multiple
    tail-padding path and duplicate ids."""
    rng = np.random.default_rng(3)
    N, F = 96, 256
    table = jnp.asarray(rng.standard_normal((N, F)), jnp.bfloat16)
    for L in (40, 64, 7):
        idx = jnp.asarray(rng.integers(0, N, L), jnp.int32)
        for g in (2, 4, 16):
            out = gather_rows(table, idx, group=g)
            assert out.shape == (L, F)
            np.testing.assert_array_equal(
                np.asarray(out, np.float32), np.asarray(table[idx], np.float32)
            )


def test_pallas_gather_mean_matches_jnp():
    rng = np.random.default_rng(1)
    cap, F, S, k = 50, 128, 12, 5
    h = jnp.asarray(rng.standard_normal((cap, F)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, cap, (S, k)), jnp.int32)
    mask = jnp.asarray(rng.random((S, k)) < 0.8)
    out = gather_mean(h, slots, mask)
    ref = spmm.gather_mean(h, slots, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_frontier_caps_truncation_semantics():
    from dist_gnn_tpu.sampler import sample_blocks

    rng = np.random.default_rng(2)
    N, E = 2000, 40000
    hg = HostGraph.from_coo(rng.integers(0, N, E), rng.integers(0, N, E), N)
    g = hg.to_device()
    B, k = 64, 8
    seeds = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    cap = B + 200  # force truncation (worst case B + B*k = 576)
    blocks, _ = sample_blocks(
        g, seeds, jnp.ones(B, bool), (k,), False, jax.random.key(0),
        frontier_caps=(cap,),
    )
    b = blocks[0]
    assert b.frontier.shape[0] == cap
    f, fm = np.asarray(b.frontier), np.asarray(b.frontier_mask)
    sl, nm = np.asarray(b.neigh_slots), np.asarray(b.neigh_mask)
    # every surviving neighbor resolves inside the cap and to a valid id
    assert (sl[nm] < cap).all()
    assert fm[sl[nm]].all()
    # seeds-first invariant holds after truncation
    np.testing.assert_array_equal(f[:B], np.asarray(seeds))
    # full-capacity run has at least as many valid neighbors
    full, _ = sample_blocks(
        g, seeds, jnp.ones(B, bool), (k,), False, jax.random.key(0)
    )
    assert nm.sum() <= np.asarray(full[0].neigh_mask).sum()
