"""GAT aggregation over static padded blocks (SDDMM + edge-softmax + SpMM).

The reference has no GAT (models are DGL SAGEConv only) but the driver
north star (BASELINE.json) asks for GAT/SDDMM attention as a first-class
aggregator.  On the padded block format the three sparse kernels become
dense masked ops that XLA fuses:

    SDDMM:        e_ij = LeakyReLU(a_l . z_i  +  a_r . z_j),  z = h W
    edge-softmax: alpha = masked softmax over each row's k slots
    SpMM:         out_i = sum_j alpha_ij z_j     (multi-head)
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from dist_gnn_tpu.models.sage import _glorot
from dist_gnn_tpu.ops.spmm import masked_segment_softmax
from dist_gnn_tpu.ops.prng import dropout_keep
from dist_gnn_tpu.sampler import Block


class GAT:
    def __init__(
        self,
        in_feats: int,
        n_hidden: int,
        n_classes: int,
        num_layers: int,
        num_heads: int = 4,
        dropout: float = 0.5,
        negative_slope: float = 0.2,
        param_dtype=jnp.float32,
        compute_dtype=None,
        use_fused: bool = True,
        input_grad: bool = False,
    ):
        self.num_heads = num_heads
        self.negative_slope = negative_slope
        self.dropout = dropout
        self.param_dtype = param_dtype
        self.compute_dtype = compute_dtype
        # fused Pallas SDDMM-softmax-aggregate-project kernel
        # (ops/gat_pallas.py) on layers whose shapes divide its block
        # rows.  Accepts True/False, or a collection of layer indices for
        # hybrid configs (e.g. (0,) = kernel on the big layer 0 only, jnp
        # elsewhere — fewer scheduler-opaque pallas calls per step)
        self.use_fused = (
            use_fused
            if isinstance(use_fused, bool)
            else frozenset(int(i) for i in use_fused)
        )
        # True if callers differentiate wrt the layer-0 input features
        # (training never does; the kernel then skips d_x entirely)
        self.input_grad = input_grad
        self.dims: List[tuple] = []
        for l in range(num_layers):
            d_in = in_feats if l == 0 else n_hidden * num_heads
            last = l == num_layers - 1
            d_out = n_classes if last else n_hidden
            self.dims.append((d_in, d_out, last))

    def init(self, key: jax.Array) -> Dict[str, Any]:
        params = {}
        H = self.num_heads
        for l, (d_in, d_out, _) in enumerate(self.dims):
            k1, k2, k3, key = jax.random.split(key, 4)
            params[f"layer{l}"] = {
                "w": _glorot(k1, (d_in, H * d_out), self.param_dtype),
                "a_l": jax.random.normal(k2, (H, d_out), self.param_dtype) * 0.1,
                "a_r": jax.random.normal(k3, (H, d_out), self.param_dtype) * 0.1,
                "b": jnp.zeros((H * d_out,), self.param_dtype),
            }
        return params

    @staticmethod
    def fused_ok(S: int, k: int, d_in: int) -> bool:
        """Whether a hop of shape (S dst rows, k slots, d_in features) takes
        the fused Pallas kernel (ops/gat_pallas.py).  EVERY layer does at
        the bench config — deduped upper hops included, via the k-major
        ``h[slots.T]`` gather shim in :meth:`apply` (round-4 VERDICT #2);
        only shapes outside the kernel's envelope (huge feature dims,
        k > 32, row counts not divisible by its VMEM block) fall back to
        the jnp path.  Pinned by ``tests/test_gat_kernel.py``."""
        from dist_gnn_tpu.ops.gat_pallas import _block_rows

        return d_in <= 1024 and k <= 32 and S % _block_rows(d_in) == 0

    def _project(self, p, h, d_out: int):
        """Shared SDDMM prologue: (z [S, H*d] FLAT, el [S, H], er [S, H]).

        el/er are computed as ONE [H*d, 2H] block-diagonal matmul on the
        flat z instead of per-head einsums over a [S, H, d] reshape: the
        reshape puts H(=4) on the sublane axis (>=50% VPU waste at H<8)
        and measured 0.88 ms/step slower at bench shapes (probe_step24:
        flat matmul 0.48 ms vs reshape einsums 1.36 ms)."""
        cd = self.compute_dtype
        w = p["w"] if cd is None else p["w"].astype(cd)
        z = jnp.dot(h, w, preferred_element_type=jnp.float32).astype(h.dtype)
        H = self.num_heads
        eye = jnp.eye(H, dtype=z.dtype)
        al = jnp.einsum("hd,hg->hdg", p["a_l"].astype(z.dtype), eye)
        ar = jnp.einsum("hd,hg->hdg", p["a_r"].astype(z.dtype), eye)
        A = jnp.concatenate(
            [al.reshape(H * d_out, H), ar.reshape(H * d_out, H)], axis=1
        )
        eler = jnp.dot(z, A, preferred_element_type=jnp.float32)  # [S, 2H]
        return z, eler[:, :H], eler[:, H:]

    def _combine(self, p, out, d_out: int, last: bool):
        """Head combine + bias (+ activation on hidden layers)."""
        H = self.num_heads
        if last:
            return jnp.mean(out, axis=1) + p["b"].reshape(H, d_out).mean(0)
        h = out.reshape(out.shape[0], H * d_out) + p["b"]
        return jax.nn.elu(h)

    def _combine_heads(self, p, outs, d_out: int, last: bool):
        """:meth:`_combine` on a per-head list of [S, d] (flat path)."""
        H = self.num_heads
        if last:
            mean = outs[0]
            for o in outs[1:]:
                mean = mean + o
            return mean / H + p["b"].reshape(H, d_out).mean(0)
        h = jnp.concatenate(outs, axis=1) + p["b"]
        return jax.nn.elu(h)

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
        """Aggregate-then-project formulation (probe_gat1, round-3):

        Because every neighbor shares the projection W, attention commutes
        with it:  sum_j a_ij (W x_j) = W (sum_j a_ij x_j);  and the SDDMM
        halves fold through W too:  a_l . (W x) = (W^T a_l) . x.  So the
        [S*k, H*d] projected tensor z is NEVER materialized in training —
        scores come from one [*, 2H] matmul against the folded W @ A, and
        the per-head weighted sum runs over the RAW inputs [S, k, d_in]
        before a tiny [S, d_in] x [d_in, d] projection per head.  Measured
        at bench layer-0 shapes (S=26624, k=15, H=4, d=128, in=100 bf16):
        fwd 2.82 -> 2.05 ms, value_and_grad 9.38 -> 4.66 ms vs the
        project-first per-head form (probe_gat1 on v5e); the FLOP count
        drops k-fold on the projection (z cost S*k*d_in*H*d -> S*d_in*H*d).
        Exact up to f32/bf16 accumulation order (max|diff| ~ bf16 eps).
        ``_project`` (z-based) is kept for the layer-wise inference paths
        that genuinely reuse z across destination chunks.
        """
        from dist_gnn_tpu.ops.gat_pallas import gat_attention

        H = self.num_heads
        cd = self.compute_dtype
        h = x if cd is None else x.astype(cd)
        for l, block in enumerate(blocks):
            d_in, d_out, last = self.dims[l]
            p = params[f"layer{l}"]
            w = p["w"] if cd is None else p["w"].astype(cd)
            S_, k_ = block.neigh_mask.shape
            want_fused = (
                self.use_fused
                if isinstance(self.use_fused, bool)
                else l in self.use_fused
            )
            use_fused = want_fused and self.fused_ok(S_, k_, d_in)
            if use_fused:
                w32 = p["w"].astype(jnp.float32).reshape(d_in, H, d_out)
                wal = jnp.einsum("ehd,hd->eh", w32, p["a_l"].astype(jnp.float32))
                war = jnp.einsum("ehd,hd->eh", w32, p["a_r"].astype(jnp.float32))
                x_dst = h[: block.num_dst]
                if l == 0 and contiguous_first:
                    # k-major dedup-free hop: free reshape to [k, S, E]
                    x_n3 = h[block.num_dst :].reshape(k_, S_, d_in)
                else:
                    safe = jnp.where(block.neigh_mask, block.neigh_slots, 0)
                    x_n3 = h[safe.T]  # [k, S, E] k-major gather
                # last layer: pad the head dim to the kernel's 128-lane
                # granularity with ZERO columns — wal/war fold only real
                # columns, padded outputs are exactly 0 and sliced away
                D_pad = -(-d_out // 128) * 128
                w_k = w
                if D_pad != d_out:
                    w_k = jnp.concatenate(
                        [
                            w.reshape(d_in, H, d_out),
                            jnp.zeros((d_in, H, D_pad - d_out), w.dtype),
                        ],
                        axis=2,
                    ).reshape(d_in, H * D_pad)
                out = gat_attention(
                    x_dst,
                    x_n3,
                    block.neigh_mask.astype(jnp.float32),
                    wal.astype(h.dtype),
                    war.astype(h.dtype),
                    w_k,
                    self.negative_slope,
                    l > 0 or self.input_grad,
                )
                if D_pad != d_out:
                    out = out.reshape(S_, H, D_pad)[:, :, :d_out].reshape(
                        S_, H * d_out
                    )
                if last:
                    h = out.reshape(S_, H, d_out).mean(axis=1) + p["b"].reshape(
                        H, d_out
                    ).mean(0)
                    h = h.astype(x.dtype)
                    continue
                h = jax.nn.elu(out + p["b"])
                if train and self.dropout > 0:
                    assert rng is not None
                    rng, sub = jax.random.split(rng)
                    keep = dropout_keep(sub, h.shape, 1 - self.dropout)
                    h = jnp.where(keep, h / (1 - self.dropout), 0)
                h = h.astype(x.dtype)
                continue
            # folded SDDMM: el/er = h @ (W @ A), A the [H*d, 2H]
            # block-diagonal attention matrix — no z
            eye = jnp.eye(H, dtype=jnp.float32)
            al = jnp.einsum(
                "hd,hg->hdg", p["a_l"].astype(jnp.float32), eye
            ).reshape(H * d_out, H)
            ar = jnp.einsum(
                "hd,hg->hdg", p["a_r"].astype(jnp.float32), eye
            ).reshape(H * d_out, H)
            WA = jnp.dot(
                w.astype(jnp.float32), jnp.concatenate([al, ar], axis=1)
            )  # [d_in, 2H] — tiny
            eler = jnp.dot(
                h, WA.astype(h.dtype), preferred_element_type=jnp.float32
            )  # [*, 2H]
            el = eler[: block.num_dst, :H]  # [S, H]
            if l == 0 and contiguous_first:
                # k-major dedup-free hop: reshape [k, S, *] then transpose
                # (fallback path only — the fused kernel consumes k-major
                # natively)
                er_n = eler[block.num_dst :, H:].reshape(k_, S_, H).transpose(1, 0, 2)
                x_n = h[block.num_dst :].reshape(k_, S_, d_in).transpose(1, 0, 2)
            else:
                sel = eler[block.neigh_slots]  # [S, k, 2H]
                er_n = sel[..., H:]
                x_n = h[block.neigh_slots]  # [S, k, d_in]
            scores = jax.nn.leaky_relu(
                el[:, None, :] + er_n, self.negative_slope
            )
            alpha = masked_segment_softmax(scores, block.neigh_mask)  # [S, k, H]
            # per-head: weighted-sum the raw inputs, then project.  The
            # per-head loop keeps clean (k, d_in) VPU tiling (H on the
            # sublane axis wastes >=50% at H=4 — probe_step24), and the
            # projections are H small MXU matmuls.
            outs = []
            for hh in range(H):
                agg = jnp.sum(
                    x_n * alpha[:, :, hh, None].astype(x_n.dtype), axis=1
                )  # [S, d_in]
                outs.append(
                    jnp.dot(
                        agg, w[:, hh * d_out : (hh + 1) * d_out],
                        preferred_element_type=jnp.float32,
                    ).astype(x_n.dtype)
                )
            h = self._combine_heads(p, outs, d_out, last)
            if not last and train and self.dropout > 0:
                assert rng is not None
                rng, sub = jax.random.split(rng)
                keep = dropout_keep(sub, h.shape, 1 - self.dropout)
                h = jnp.where(keep, h / (1 - self.dropout), 0)
            h = h.astype(x.dtype)
        return h
