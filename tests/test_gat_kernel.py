"""Fused Pallas GAT layer (ops/gat_pallas.py) vs jnp oracles.

Runs in interpret mode on the CPU mesh (conftest forces CPU); the same
code compiles natively on TPU.  Checks forward AND grads (custom VJP)
against both the module's own f32 oracle and the shipped jnp GAT layer's
masked-softmax math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dist_gnn_tpu.ops.gat_pallas import (
    gat_attention,
    gat_attention_reference,
)


def _mk(seed, S, K, E, H, D, dtype=jnp.float32, holes=True):
    rng = np.random.default_rng(seed)
    x_dst = jnp.asarray(rng.standard_normal((S, E)), dtype)
    x_n = jnp.asarray(rng.standard_normal((K, S, E)), dtype)
    if holes:
        mask = rng.random((S, K)) < 0.85
        mask[0, :] = False  # one fully-masked row
        mask[1, :] = True
    else:
        mask = np.ones((S, K), bool)
    mask_f = jnp.asarray(mask.astype(np.float32))
    wal = jnp.asarray(rng.standard_normal((E, H)) * 0.1, dtype)
    war = jnp.asarray(rng.standard_normal((E, H)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((E, H * D)) * 0.1, dtype)
    return x_dst, x_n, mask_f, wal, war, w


@pytest.mark.parametrize("S,K,E,H,D", [(256, 5, 64, 4, 128), (512, 3, 100, 2, 128)])
def test_forward_matches_reference(S, K, E, H, D):
    args = _mk(0, S, K, E, H, D)
    out = gat_attention(*args, 0.2, True)
    ref = gat_attention_reference(*args, 0.2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fully_masked_row_outputs_zero():
    args = _mk(1, 256, 4, 32, 2, 128)
    out = np.asarray(gat_attention(*args, 0.2, True))
    assert np.all(out[0] == 0.0)


def test_grads_match_reference():
    args = _mk(2, 256, 4, 48, 2, 128)
    x_dst, x_n, mask_f, wal, war, w = args

    def loss_k(xd, xn, wal_, war_, w_):
        o = gat_attention(xd, xn, mask_f, wal_, war_, w_, 0.2, True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_r(xd, xn, wal_, war_, w_):
        o = gat_attention_reference(xd, xn, mask_f, wal_, war_, w_, 0.2)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x_dst, x_n, wal, war, w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x_dst, x_n, wal, war, w)
    for a, b, name in zip(gk, gr, ["dx_dst", "dx_n", "dwal", "dwar", "dw"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_need_dx_false_zeroes_input_grads_only():
    args = _mk(3, 256, 3, 32, 2, 128)
    x_dst, x_n, mask_f, wal, war, w = args

    def loss(xd, xn, w_, need_dx):
        o = gat_attention(xd, xn, mask_f, wal, war, w_, 0.2, need_dx)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_with = jax.grad(loss, argnums=(0, 1, 2))(x_dst, x_n, w, True)
    g_wo = jax.grad(loss, argnums=(0, 1, 2))(x_dst, x_n, w, False)
    assert np.all(np.asarray(g_wo[0]) == 0) and np.all(np.asarray(g_wo[1]) == 0)
    np.testing.assert_allclose(
        np.asarray(g_wo[2]), np.asarray(g_with[2]), rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(g_with[0])).max() > 0


def test_bf16_forward_close():
    args32 = _mk(4, 256, 5, 64, 4, 128)
    args16 = tuple(
        a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a.ndim > 1 and i != 2 else a
        for i, a in enumerate(args32)
    )
    out16 = np.asarray(gat_attention(*args16, 0.2, True), np.float32)
    ref32 = np.asarray(gat_attention_reference(*args32, 0.2), np.float32)
    # bf16 inputs: agreement to ~1e-2 relative
    denom = np.abs(ref32).max()
    assert np.abs(out16 - ref32).max() / denom < 0.05


def test_fused_model_matches_reference_path_e2e():
    """Full GAT train step with ALL layers on the fused kernel (including
    the zero-padded last layer, d_out=7 -> D_pad=128) equals the jnp
    reference path: same loss, same params after one Adam step."""
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import GAT
    from dist_gnn_tpu.training import Trainer

    arrays, meta = make_synthetic_dataset(
        num_nodes=8000, avg_degree=10, feature_dim=64, num_classes=7,
        train_frac=0.5, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    feats = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    kw = dict(fan_out=(4, 3), dedup_last=False, frontier_caps=(1024, 10**9))
    tr = Trainer(model=GAT(64, 128, 7, 2, num_heads=4), **kw)
    tr_ref = Trainer(model=GAT(64, 128, 7, 2, num_heads=4, use_fused=False), **kw)
    st = tr.init_state(jax.random.key(0))
    st_r = st
    B = 256  # layer-0 S=1024 (sb 256), last layer S=256 (sb 128): all fused
    seeds = jnp.asarray(arrays["train_idx"][:B])
    mask = jnp.ones(B, bool)
    st, m = tr.train_step(st, graph, feats, labels, seeds, mask, jax.random.key(1))
    st_r, m_r = tr_ref.train_step(
        st_r, graph, feats, labels, seeds, mask, jax.random.key(1)
    )
    assert abs(float(m["loss"]) - float(m_r["loss"])) < 2e-3
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st_r.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-3
        )


def test_all_bench_layers_take_fused_path():
    """Round-4 VERDICT #2: the fused kernel must cover EVERY layer at the
    bench config — including deduped upper hops (which reach it through
    the k-major ``h[slots.T]`` gather shim).  Pins (a) the static gate for
    the three bench layer shapes and (b) the runtime call count on a
    small-but-structurally-identical run (one fused call per layer)."""
    from dist_gnn_tpu.models.gat import GAT
    from dist_gnn_tpu.ops import gat_pallas

    # (S, k, d_in) per layer at the bench config (batch 512, fanout
    # [15,10,5], caps (3072, 26624), hidden 128 x 4 heads)
    bench_layers = [(26624, 15, 100), (3072, 10, 512), (512, 5, 512)]
    for S, k, d_in in bench_layers:
        assert GAT.fused_ok(S, k, d_in), (S, k, d_in)

    # runtime: count _fwd_call invocations through a full train step
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.training import Trainer

    arrays, meta = make_synthetic_dataset(
        num_nodes=8000, avg_degree=10, feature_dim=64, num_classes=7,
        train_frac=0.5, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    graph = hg.to_device()
    feats = jnp.asarray(arrays["features"])
    labels = jnp.asarray(arrays["labels"])
    calls = []
    orig = gat_pallas._fwd_call

    def counting(*a, **kw):
        calls.append(a[0].shape)  # x_n [K, S, E]
        return orig(*a, **kw)

    gat_pallas._fwd_call = counting
    try:
        tr = Trainer(
            model=GAT(64, 128, 7, 3, num_heads=4),
            fan_out=(6, 4, 3), dedup_last=False,
            frontier_caps=(768, 3072, 10**9),
        )
        st = tr.init_state(jax.random.key(0))
        seeds = jnp.asarray(arrays["train_idx"][:256])
        mask = jnp.ones(256, bool)
        tr.train_step(st, graph, feats, labels, seeds, mask, jax.random.key(1))
    finally:
        gat_pallas._fwd_call = orig
    assert len(calls) == 3, calls  # one fused call per layer, none fell back
