"""GCN (Kipf & Welling) over static padded blocks.

The reference ships only DGL ``SAGEConv`` models
(``example/graphsage/utils/models.py:25-55``); GCN broadens the model zoo
with the same block contract, so every sampler/trainer/inference path works
unchanged.  Per layer, on a sampled block:

    h_i = act( ( sum_{j in N(i)} h_j / sqrt((deg_i+1)(deg_j+1))
                 + h_i / (deg_i+1) ) @ W + b )

i.e. symmetric-normalised aggregation with a self loop, the standard GCN
propagation rule restricted to the sampled neighborhood (degrees are the
VALID sampled slot counts + 1 for the self loop, so the operator is a
proper normalised adjacency of the block).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from dist_gnn_tpu.models.sage import _glorot
from dist_gnn_tpu.ops.prng import dropout_keep
from dist_gnn_tpu.sampler import Block


class GCN:
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
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> Dict[str, Any]:
        params = {}
        for l, (d_in, d_out) in enumerate(self.dims):
            k1, key = jax.random.split(key)
            params[f"layer{l}"] = {
                "w": _glorot(k1, (d_in, d_out), self.param_dtype),
                "b": jnp.zeros((d_out,), self.param_dtype),
            }
        return params

    def _aggregate(self, h, block: Block, contiguous: bool):
        """Symmetric-normalised neighbor sum + self loop: [S, F]."""
        S = block.num_dst
        S_, k_ = block.neigh_mask.shape
        # block degrees: valid sampled in-neighbors (+1 self loop)
        deg_dst = jnp.sum(block.neigh_mask, axis=1).astype(h.dtype) + 1  # [S]
        # source-side degree: within a sampled block the src rows' own
        # degrees are unknown for non-dst frontier nodes; GCN-on-blocks
        # convention (as in minibatch GCN training) normalises by the dst
        # degree on both sides of the product for frontier-only sources,
        # and by the true block degree when the source is also a dst row.
        # NB dedup_last=False: the dedup-free final hop never maps a
        # neighbor onto a dst slot, so a neighbor equal to a seed gets
        # d_j = 1 there instead of the seed's block degree — a slightly
        # different (still valid) minibatch-GCN normalization, not an
        # error (see the Trainer.dedup_last flag comment).
        src_deg = jnp.ones((block.num_src,), h.dtype)
        src_deg = src_deg.at[:S].set(deg_dst)
        d_j = src_deg[jnp.where(block.neigh_mask, block.neigh_slots, 0)]
        m = block.neigh_mask.astype(h.dtype)
        coef = m / jnp.sqrt(deg_dst[:, None] * d_j)
        if contiguous:
            # k-major dedup-free hop: [k, S, F] with per-k contiguous rows
            nb = h[S:].reshape(k_, S_, h.shape[1])
            agg = jnp.sum(nb * coef.T[..., None], axis=0)
        else:
            nb = h[block.neigh_slots]  # [S, k, F]
            agg = jnp.sum(nb * coef[..., None], axis=1)
        return agg + h[:S] / deg_dst[:, None]

    def apply(
        self,
        params: Dict[str, Any],
        blocks: Sequence[Block],
        x: jnp.ndarray,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        contiguous_first: bool = False,
    ) -> jnp.ndarray:
        assert len(blocks) == len(self.dims)
        cd = self.compute_dtype
        h = x if cd is None else x.astype(cd)
        for l, block in enumerate(blocks):
            p = params[f"layer{l}"]
            w = p["w"] if cd is None else p["w"].astype(cd)
            agg = self._aggregate(h, block, contiguous=(l == 0 and contiguous_first))
            h = (
                jnp.dot(agg, w, preferred_element_type=jnp.float32) + p["b"]
            ).astype(agg.dtype)
            if l != len(self.dims) - 1:
                h = jax.nn.relu(h)
                if train and self.dropout > 0:
                    assert rng is not None
                    rng, sub = jax.random.split(rng)
                    keep = dropout_keep(sub, h.shape, 1 - self.dropout)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
        return h
