"""GraphSAGE (mean aggregator) over static padded blocks.

Capability parity with the reference's DGL stack
(``example/graphsage/utils/models.py:25-55``: SAGEConv(in, out, 'mean')
layers, ReLU + dropout(0.5) between layers, hidden 256), re-implemented as
a functional JAX model so the whole step jits/pjits cleanly:

    h_dst = h_src[:S]                      (seeds-first frontier invariant)
    out   = h_dst @ W_self + mean_valid(neigh) @ W_neigh + b

which matches DGL SAGEConv 'mean' (fc_self + fc_neigh, single bias).
Weights are bf16-castable; matmuls carry ``preferred_element_type=float32``
so the MXU accumulates in f32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from dist_gnn_tpu.ops.spmm import gather_mean
from dist_gnn_tpu.ops.prng import dropout_keep
from dist_gnn_tpu.sampler import Block


def _glorot(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class SAGE:
    def __init__(
        self,
        in_feats: int,
        n_hidden: int,
        n_classes: int,
        num_layers: int,
        dropout: float = 0.5,
        param_dtype=jnp.float32,
        compute_dtype=None,
    ):
        self.dims: List[tuple] = []
        for l in range(num_layers):
            d_in = in_feats if l == 0 else n_hidden
            d_out = n_classes if l == num_layers - 1 else n_hidden
            self.dims.append((d_in, d_out))
        self.dropout = dropout
        self.param_dtype = param_dtype
        # bf16 compute (params stay f32, MXU accumulates f32) halves HBM
        # traffic and doubles MXU rate; None = compute in input dtype
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> Dict[str, Any]:
        params = {}
        for l, (d_in, d_out) in enumerate(self.dims):
            k1, k2, key = jax.random.split(key, 3)
            params[f"layer{l}"] = {
                "w_self": _glorot(k1, (d_in, d_out), self.param_dtype),
                "w_neigh": _glorot(k2, (d_in, d_out), self.param_dtype),
                "b": jnp.zeros((d_out,), self.param_dtype),
            }
        return params

    def _layer_forward(self, p, h_dst, h_mean):
        """One SAGEConv-mean layer given the destination features and the
        aggregated neighbor mean (shared by block training and full-graph
        inference)."""
        cd = self.compute_dtype
        w_self = p["w_self"] if cd is None else p["w_self"].astype(cd)
        w_neigh = p["w_neigh"] if cd is None else p["w_neigh"].astype(cd)
        if cd is not None:
            h_dst = h_dst.astype(cd)
            h_mean = h_mean.astype(cd)
        out = (
            jnp.dot(h_dst, w_self, preferred_element_type=jnp.float32)
            + jnp.dot(h_mean, w_neigh, preferred_element_type=jnp.float32)
            + p["b"]
        )
        return out.astype(h_dst.dtype if cd is None else cd)

    def apply(
        self,
        params: Dict[str, Any],
        blocks: Sequence[Block],
        x: jnp.ndarray,  # [cap_deepest_frontier, in_feats]
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        contiguous_first: bool = False,
    ) -> jnp.ndarray:
        """blocks must be ordered *input-first* (deepest layer first), i.e.
        ``reversed(sampler output)``; x are features of blocks[0]'s frontier.
        Returns logits for blocks[-1]'s seeds (the mini-batch).

        ``contiguous_first``: the first block came from a dedup-free hop
        (sampler.py ``_no_dedup_block``) whose slots are exactly
        ``S + arange(B*k)`` — aggregate by reshape instead of gather."""
        assert len(blocks) == len(self.dims)
        cd = self.compute_dtype
        h = x if cd is None else x.astype(cd)
        for l, block in enumerate(blocks):
            p = params[f"layer{l}"]
            h_dst = h[: block.num_dst]
            if l == 0 and contiguous_first:
                # k-major dedup-free hop (sampler._no_dedup_block): the
                # frontier tail reshapes to [k, B, F] with per-k slices
                # contiguous — the sum runs over the leading axis with F
                # on lanes and B on sublanes (full VPU tiles).
                B, k = block.neigh_mask.shape
                nb = h[block.num_dst :].reshape(k, B, h.shape[1])
                m = block.neigh_mask.T[..., None].astype(h.dtype)
                cnt = jnp.sum(block.neigh_mask, axis=1, dtype=h.dtype)[:, None]
                h_mean = jnp.sum(nb * m, axis=0) / jnp.maximum(cnt, 1)
            else:
                h_mean = gather_mean(h, block.neigh_slots, block.neigh_mask)
            h = self._layer_forward(p, h_dst, h_mean).astype(h.dtype)
            if l != len(self.dims) - 1:
                h = jax.nn.relu(h)
                if train and self.dropout > 0:
                    assert rng is not None
                    rng, sub = jax.random.split(rng)
                    keep = dropout_keep(sub, h.shape, 1 - self.dropout)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
        return h
