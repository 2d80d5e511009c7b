"""Cross-framework parity: JAX model vs an independent torch (CPU)
implementation of the same math on identical fixed blocks.

BASELINE.json's accuracy-parity protocol asks for per-layer allclose and
gradient agreement with the reference stack (DGL SAGEConv + torch).  DGL
isn't installable here, but SAGEConv-mean's math is small enough to state
exactly in torch (fc_self + fc_neigh over a masked neighbor mean, shared
bias — ``/root/reference/example/graphsage/utils/models.py:25-55`` uses
DGL's 'mean' aggregator which reduces to this), so torch autograd serves
as a fully independent oracle for BOTH the forward values and the
parameter gradients through a multi-layer sampled block stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.sampler import Block
from dist_gnn_tpu.training import Trainer


def _rand_block(S, k, cap_src, seed):
    rng = np.random.default_rng(seed)
    slots = rng.integers(0, cap_src, (S, k)).astype(np.int32)
    mask = rng.random((S, k)) < 0.8
    return Block(
        seeds=jnp.arange(S, dtype=jnp.int32),
        seed_mask=jnp.ones(S, bool),
        frontier=jnp.arange(cap_src, dtype=jnp.int32),
        frontier_mask=jnp.ones(cap_src, bool),
        num_frontier=jnp.int32(cap_src),
        neigh_slots=jnp.asarray(slots),
        neigh_mask=jnp.asarray(mask),
    )


def _torch_sage_loss(params_np, blocks, x_np, labels_np):
    """The exact math of SAGE.apply + Trainer._loss_fn in torch."""
    tparams = {
        name: {
            kk: torch.tensor(vv, requires_grad=True, dtype=torch.float64)
            for kk, vv in layer.items()
        }
        for name, layer in params_np.items()
    }
    h = torch.tensor(x_np, dtype=torch.float64)
    n_layers = len(tparams)
    for l, blk in enumerate(blocks):
        p = tparams[f"layer{l}"]
        S = int(blk.num_dst)
        slots = torch.tensor(np.asarray(blk.neigh_slots), dtype=torch.long)
        mask = torch.tensor(np.asarray(blk.neigh_mask), dtype=torch.float64)
        nb = h[slots]  # [S, k, F]
        s = (nb * mask[..., None]).sum(dim=1)
        cnt = mask.sum(dim=1, keepdim=True).clamp(min=1.0)
        h_mean = s / cnt
        h = h[:S] @ p["w_self"] + h_mean @ p["w_neigh"] + p["b"]
        if l != n_layers - 1:
            h = torch.relu(h)
    labels = torch.tensor(labels_np, dtype=torch.long)
    loss = torch.nn.functional.cross_entropy(h, labels)
    loss.backward()
    grads = {
        name: {kk: vv.grad.numpy() for kk, vv in layer.items()}
        for name, layer in tparams.items()
    }
    return h.detach().numpy(), float(loss.detach()), grads


def test_sage_loss_and_grads_match_torch_autograd():
    k = 5
    rng = np.random.default_rng(3)
    # two-layer block stack: deepest frontier 120 -> 24 dst; inner 24 -> 8
    blk0 = _rand_block(24, k, 120, seed=1)
    blk1 = _rand_block(8, k, 24, seed=2)
    x = rng.standard_normal((120, 16)).astype(np.float32)
    labels = rng.integers(0, 4, 8).astype(np.int32)

    model = SAGE(16, 12, 4, 2, dropout=0.0)
    trainer = Trainer(model=model, fan_out=(k, k))
    params = model.init(jax.random.key(0))
    params_np = {
        name: {kk: np.asarray(vv, np.float64) for kk, vv in layer.items()}
        for name, layer in params.items()
    }

    # JAX side: logits, loss, grads through Trainer._loss_fn
    blocks = (blk1, blk0)  # trainer's loss takes output-layer-first order
    (loss_j, _), grads_j = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        params, blocks, jnp.asarray(x), jnp.asarray(labels),
        jnp.ones(8, bool), jax.random.key(1),
    )
    logits_j = model.apply(
        params, (blk0, blk1), jnp.asarray(x), train=False
    )

    # torch side: independent implementation + autograd
    logits_t, loss_t, grads_t = _torch_sage_loss(
        params_np, [blk0, blk1], x.astype(np.float64), labels
    )

    np.testing.assert_allclose(
        np.asarray(logits_j, np.float64), logits_t, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=1e-5)
    for lname in params:
        for kk in params[lname]:
            np.testing.assert_allclose(
                np.asarray(grads_j[lname][kk], np.float64),
                grads_t[lname][kk],
                rtol=2e-3, atol=1e-6,
                err_msg=f"grad mismatch at {lname}/{kk}",
            )


def _torch_gcn_loss(params_np, blocks, x_np, labels_np):
    """The exact math of GCN.apply + cross-entropy in torch."""
    tparams = {
        name: {
            kk: torch.tensor(vv, requires_grad=True, dtype=torch.float64)
            for kk, vv in layer.items()
        }
        for name, layer in params_np.items()
    }
    h = torch.tensor(x_np, dtype=torch.float64)
    n_layers = len(tparams)
    for l, blk in enumerate(blocks):
        p = tparams[f"layer{l}"]
        S = int(blk.num_dst)
        slots = torch.tensor(np.asarray(blk.neigh_slots), dtype=torch.long)
        mask = torch.tensor(np.asarray(blk.neigh_mask), dtype=torch.float64)
        deg = mask.sum(dim=1) + 1.0
        src_deg = torch.ones(h.shape[0], dtype=torch.float64)
        src_deg[:S] = deg
        d_j = src_deg[slots.clamp(min=0)]
        coef = mask / torch.sqrt(deg[:, None] * d_j)
        agg = (h[slots] * coef[..., None]).sum(dim=1) + h[:S] / deg[:, None]
        h = agg @ p["w"] + p["b"]
        if l != n_layers - 1:
            h = torch.relu(h)
    labels = torch.tensor(labels_np, dtype=torch.long)
    loss = torch.nn.functional.cross_entropy(h, labels)
    loss.backward()
    grads = {
        name: {kk: vv.grad.numpy() for kk, vv in layer.items()}
        for name, layer in tparams.items()
    }
    return h.detach().numpy(), float(loss.detach()), grads


def _torch_gat_loss(params_np, blocks, x_np, labels_np, H, slope):
    """The exact math of GAT.apply + cross-entropy in torch."""
    tparams = {
        name: {
            kk: torch.tensor(vv, requires_grad=True, dtype=torch.float64)
            for kk, vv in layer.items()
        }
        for name, layer in params_np.items()
    }
    h = torch.tensor(x_np, dtype=torch.float64)
    n_layers = len(tparams)
    for l, blk in enumerate(blocks):
        p = tparams[f"layer{l}"]
        last = l == n_layers - 1
        d_out = p["a_l"].shape[1]
        S = int(blk.num_dst)
        slots = torch.tensor(np.asarray(blk.neigh_slots), dtype=torch.long)
        mask = torch.tensor(np.asarray(blk.neigh_mask), dtype=torch.bool)
        z = h @ p["w"]  # [*, H*d]
        z3 = z.reshape(z.shape[0], H, d_out)
        el = (z3 * p["a_l"][None]).sum(-1)  # [*, H]
        er = (z3 * p["a_r"][None]).sum(-1)
        scores = torch.nn.functional.leaky_relu(
            el[:S][:, None, :] + er[slots], slope
        )  # [S, k, H]
        s = torch.where(mask[..., None], scores,
                        torch.finfo(torch.float64).min)
        s = s - s.max(dim=1, keepdim=True).values
        e = torch.exp(s) * mask[..., None].double()
        alpha = e / e.sum(dim=1, keepdim=True).clamp(
            min=torch.finfo(torch.float64).tiny
        )
        out = (z3[slots] * alpha[..., None]).sum(dim=1)  # [S, H, d]
        if last:
            h = out.mean(dim=1) + p["b"].reshape(H, d_out).mean(0)
        else:
            h = out.reshape(S, H * d_out) + p["b"]
            h = torch.nn.functional.elu(h)
    labels = torch.tensor(labels_np, dtype=torch.long)
    loss = torch.nn.functional.cross_entropy(h, labels)
    loss.backward()
    grads = {
        name: {kk: vv.grad.numpy() for kk, vv in layer.items()}
        for name, layer in tparams.items()
    }
    return h.detach().numpy(), float(loss.detach()), grads


def _np_params(params):
    return {
        name: {kk: np.asarray(vv, np.float64) for kk, vv in layer.items()}
        for name, layer in params.items()
    }


def _assert_close(params, logits_j, loss_j, grads_j, logits_t, loss_t, grads_t):
    np.testing.assert_allclose(
        np.asarray(logits_j, np.float64), logits_t, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=1e-5)
    for lname in params:
        for kk in params[lname]:
            np.testing.assert_allclose(
                np.asarray(grads_j[lname][kk], np.float64),
                grads_t[lname][kk],
                rtol=2e-3, atol=1e-6,
                err_msg=f"grad mismatch at {lname}/{kk}",
            )


def test_gcn_loss_and_grads_match_torch_autograd():
    from dist_gnn_tpu.models import GCN

    k = 5
    rng = np.random.default_rng(5)
    blk0 = _rand_block(24, k, 120, seed=6)
    blk1 = _rand_block(8, k, 24, seed=7)
    x = rng.standard_normal((120, 16)).astype(np.float32)
    labels = rng.integers(0, 4, 8).astype(np.int32)

    model = GCN(16, 12, 4, 2, dropout=0.0)
    trainer = Trainer(model=model, fan_out=(k, k))
    params = model.init(jax.random.key(2))

    (loss_j, _), grads_j = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        params, (blk1, blk0), jnp.asarray(x), jnp.asarray(labels),
        jnp.ones(8, bool), jax.random.key(1),
    )
    logits_j = model.apply(params, (blk0, blk1), jnp.asarray(x), train=False)
    logits_t, loss_t, grads_t = _torch_gcn_loss(
        _np_params(params), [blk0, blk1], x.astype(np.float64), labels
    )
    _assert_close(params, logits_j, loss_j, grads_j, logits_t, loss_t, grads_t)


def test_gat_loss_and_grads_match_torch_autograd():
    from dist_gnn_tpu.models import GAT

    k, H = 5, 3
    rng = np.random.default_rng(9)
    blk0 = _rand_block(24, k, 120, seed=10)
    blk1 = _rand_block(8, k, 24, seed=11)
    x = rng.standard_normal((120, 16)).astype(np.float32)
    labels = rng.integers(0, 4, 8).astype(np.int32)

    model = GAT(16, 12, 4, 2, num_heads=H, dropout=0.0)
    trainer = Trainer(model=model, fan_out=(k, k))
    params = model.init(jax.random.key(3))

    (loss_j, _), grads_j = jax.value_and_grad(trainer._loss_fn, has_aux=True)(
        params, (blk1, blk0), jnp.asarray(x), jnp.asarray(labels),
        jnp.ones(8, bool), jax.random.key(1),
    )
    logits_j = model.apply(params, (blk0, blk1), jnp.asarray(x), train=False)
    logits_t, loss_t, grads_t = _torch_gat_loss(
        _np_params(params), [blk0, blk1], x.astype(np.float64), labels,
        H, model.negative_slope,
    )
    _assert_close(params, logits_j, loss_j, grads_j, logits_t, loss_t, grads_t)
