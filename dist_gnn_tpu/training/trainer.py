"""End-to-end mini-batch trainer.

The reference has no trainer class — its training loop lives in the example
scripts (``example/graphsage/node_classification.py:213-250``) with
sampling, feature loading, and the DDP model stitched together by host
code and cuda synchronizations between the phases.

TPU-first redesign: **the entire step — sample all layers, gather
features + labels, forward, backward, Adam update — is one jitted
function.**  No host round-trips, no per-phase syncs; XLA overlaps the
gather DMA with compute and there is nothing equivalent to the reference's
per-layer nnz readbacks.  Optimizer parity: Adam lr 1e-3, weight decay
5e-4 (``node_classification.py:66``) — weight decay is applied as the
torch.optim.Adam coupled L2 term (gradient += wd * param), not AdamW.

Data parallelism: the step function is sharding-agnostic — under a mesh,
shard the seeds batch axis and replicate params; jit inserts the gradient
psum (see parallel/).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dist_gnn_tpu.graph import Graph
from dist_gnn_tpu.sampler import sample_blocks


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float, weight_decay: float):
    """Adam + coupled L2 (torch.optim.Adam parity, not AdamW) — shared by
    every trainer class (``node_classification.py:66``)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr),
    )


def init_train_state(model, optimizer, key: jax.Array) -> TrainState:
    params = model.init(key)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def masked_nll_loss(
    model, dedup_last: bool, params, blocks, feats, labels, seed_mask, rng
):
    """(loss, acc) over masked seeds — the single source of the training
    objective for Trainer, HostTierTrainer, and the distributed trainers
    that mirror it."""
    logits = model.apply(
        params, tuple(reversed(blocks)), feats, train=True, rng=rng,
        contiguous_first=not dedup_last,
    )
    labels = jnp.where(seed_mask, labels, 0)
    ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(ll, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    nll = jnp.where(seed_mask, nll, 0.0)
    n = jnp.maximum(jnp.sum(seed_mask.astype(jnp.float32)), 1.0)
    loss = jnp.sum(nll) / n
    correct = (jnp.argmax(logits, axis=-1).astype(jnp.int32) == labels) & seed_mask
    acc = jnp.sum(correct.astype(jnp.float32)) / n
    return loss, acc


def dist_masked_nll_loss(
    model, dedup_last: bool, axis_name, params, blocks, feats, labels,
    seed_mask, rng,
):
    """Distributed variant of :func:`masked_nll_loss`: returns
    ``(loss, (acc_sum, global_denom))`` normalised by the GLOBAL valid
    count (``psum`` over ``axis_name``) so the psum'd gradient equals the
    single-device gradient of the full batch — the single source for
    DistTrainer and DistHostTrainer."""
    logits = model.apply(
        params, tuple(reversed(blocks)), feats, train=True, rng=rng,
        contiguous_first=not dedup_last,
    )
    labels = jnp.where(seed_mask, labels, 0)
    ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(ll, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    nll = jnp.where(seed_mask, nll, 0.0)
    n_local = jnp.sum(seed_mask.astype(jnp.float32))
    n_global = jax.lax.psum(n_local, axis_name)
    correct = (jnp.argmax(logits, axis=-1).astype(jnp.int32) == labels) & seed_mask
    denom = jnp.maximum(n_global, 1.0)
    return jnp.sum(nll) / denom, (jnp.sum(correct.astype(jnp.float32)), denom)


@dataclasses.dataclass(eq=False)  # identity hash → usable as a jit static arg
class Trainer:
    model: Any  # SAGE/GAT-like: .init(key), .apply(params, blocks, x, ...)
    fan_out: Tuple[int, ...]
    lr: float = 1e-3
    weight_decay: float = 5e-4
    replace: bool = False
    relabel_mode: str = "auto"
    frontier_caps: Any = None  # Optional[Tuple[int, ...]], sampling order
    # False = no-dedup final hop — faster, and identical math for SAGE
    # (masked mean) and GAT (masked softmax).  GCN is the exception: its
    # symmetric norm uses the block in-degree of each SOURCE slot, and a
    # sampled neighbor that equals a seed has block degree 1 in the
    # dedup-free layout vs the seed's real degree in the deduped one — a
    # (minor) normalization difference, not an error (sampled-minibatch
    # GCN norms are approximations either way; see models/gcn.py).
    dedup_last: bool = True
    sampler_window: Any = None  # windowed-gather fast path (ops/sampling.py)
    sampler_big_budget: Any = None
    # hops with fewer than this many sampled slots (static B*k) use the
    # exact elementwise gather instead of the window — small hops are
    # latency-bound on the windowed op chain (see sample_blocks docstring)
    window_min_slots: int = 65536
    # Multi-row Pallas feature gather (ops/gather_pallas.gather_rows).
    # Honest measurement (scripts/bench_gather2.py, full-output consumption):
    # every Pallas variant LOSES to XLA's take (~92M rows/s on v5e) — grid
    # blocks 25M, explicit row DMAs 62M. Kept for study; leave 0 (= XLA take).
    gather_group: int = 0
    # Zero out gathered feature rows of invalid frontier slots.  Every
    # consumer (SAGE gather_mean / contiguous mean, GAT masked softmax,
    # the loss' seed_mask) already masks those positions, so the zeroing
    # is redundant — invalid slots gather features[0], a finite real row
    # that never reaches an unmasked path.  Kept as a flag for debugging;
    # False saves a full [cap, F] read+write pass (~0.2 ms at bench shapes).
    zero_invalid_rows: bool = False

    def __post_init__(self):
        self.optimizer = make_optimizer(self.lr, self.weight_decay)

    def _gather_rows(self, features: jnp.ndarray, safe_ids: jnp.ndarray):
        """Feature row gather: multi-row Pallas kernel when enabled."""
        if self.gather_group > 1 and features.shape[1] % 128 == 0:
            from dist_gnn_tpu.ops.gather_pallas import gather_rows

            return gather_rows(features, safe_ids, group=self.gather_group)
        return features[safe_ids]

    def init_state(self, key: jax.Array) -> TrainState:
        return init_train_state(self.model, self.optimizer, key)

    def _loss_fn(self, params, blocks, feats, labels, seed_mask, rng):
        return masked_nll_loss(
            self.model, self.dedup_last, params, blocks, feats, labels,
            seed_mask, rng,
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step(
        self,
        state: TrainState,
        graph: Graph,
        features: jnp.ndarray,  # [N, F] HBM store
        labels: jnp.ndarray,  # [N] int32
        seeds: jnp.ndarray,  # [B]
        seed_mask: jnp.ndarray,  # [B]
        key: jax.Array,
    ):
        """Fused sample+load+train step (single store in HBM)."""
        k_sample, k_drop = jax.random.split(jax.random.fold_in(key, state.step))
        blocks, samp_stats = sample_blocks(
            graph, seeds, seed_mask, tuple(self.fan_out), self.replace, k_sample,
            relabel_mode=self.relabel_mode,
            frontier_caps=self.frontier_caps,
            dedup_last=self.dedup_last,
            window=self.sampler_window,
            big_row_budget=self.sampler_big_budget,
            window_min_slots=self.window_min_slots,
        )
        input_nodes = blocks[-1].frontier
        in_mask = blocks[-1].frontier_mask
        safe = jnp.where(in_mask, input_nodes, 0)
        feats = self._gather_rows(features, safe)
        if self.zero_invalid_rows:
            feats = jnp.where(in_mask[:, None], feats, 0)
        batch_labels = jnp.where(seed_mask, labels[jnp.where(seed_mask, seeds, 0)], 0)

        (loss, acc), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, blocks, feats, batch_labels, seed_mask, k_drop
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "acc": acc, **samp_stats},
        )

    @partial(jax.jit, static_argnames=("self",))
    def train_step_multi(
        self,
        state: TrainState,
        graph: Graph,
        features: jnp.ndarray,  # [N, F] HBM store
        labels: jnp.ndarray,  # [N] int32
        seeds: jnp.ndarray,  # [U, B] — U consecutive mini-batches
        seed_masks: jnp.ndarray,  # [U, B]
        key: jax.Array,
    ):
        """U consecutive train steps fused into one jitted program.

        Bit-identical math to calling :meth:`train_step` U times (each
        sub-step folds ``state.step`` into its keys and applies its own
        Adam update), but fusing them lets XLA overlap sub-step i+1's
        sampling compute (VPU select/permutation work) with sub-step i's
        feature-gather DMA — measured 12.2 -> 10.2 ms/step on v5e at the
        bench config (scripts/probe_step11/12.py).  Metrics are from the
        last sub-step except overflow counters, which are summed.
        """
        U = seeds.shape[0]
        ovf_keys = ("sampler_overflow", "frontier_overflow")
        totals = {k: jnp.int32(0) for k in ovf_keys}
        metrics = {}
        for u in range(U):
            state, metrics = self.train_step.__wrapped__(
                self, state, graph, features, labels, seeds[u], seed_masks[u],
                key,
            )
            for k in ovf_keys:
                if k in metrics:
                    totals[k] = totals[k] + jnp.asarray(metrics[k], jnp.int32)
        metrics = {**metrics, **totals}
        return state, metrics

    @partial(jax.jit, static_argnames=("self",))
    def eval_step(
        self,
        params,
        graph: Graph,
        features: jnp.ndarray,
        labels: jnp.ndarray,
        seeds: jnp.ndarray,
        seed_mask: jnp.ndarray,
        key: jax.Array,
    ):
        blocks, _ = sample_blocks(
            graph, seeds, seed_mask, tuple(self.fan_out), self.replace, key,
            relabel_mode=self.relabel_mode,
            frontier_caps=self.frontier_caps,
            dedup_last=self.dedup_last,
            window=self.sampler_window,
            big_row_budget=self.sampler_big_budget,
            window_min_slots=self.window_min_slots,
        )
        input_nodes = blocks[-1].frontier
        in_mask = blocks[-1].frontier_mask
        safe = jnp.where(in_mask, input_nodes, 0)
        feats = self._gather_rows(features, safe)
        if self.zero_invalid_rows:
            feats = jnp.where(in_mask[:, None], feats, 0)
        logits = self.model.apply(
            params, tuple(reversed(blocks)), feats, train=False,
            contiguous_first=not self.dedup_last,
        )
        batch_labels = jnp.where(seed_mask, labels[jnp.where(seed_mask, seeds, 0)], 0)
        correct = (
            jnp.argmax(logits, axis=-1).astype(jnp.int32) == batch_labels
        ) & seed_mask
        return jnp.sum(correct.astype(jnp.int32)), jnp.sum(seed_mask.astype(jnp.int32))
