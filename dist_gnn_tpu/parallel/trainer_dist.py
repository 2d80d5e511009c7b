"""Distributed trainer: per-chip sample→exchange→train pipeline in shard_map.

Architecture parity with the reference (one SPMD worker per accelerator,
``example/graphsage/node_classification.py:31-65``):

  reference (per GPU)                    TPU (per chip, inside shard_map)
  -------------------                    --------------------------------
  local sampling on cached structure  →  local sampling on replicated CSC
  P2P peer-pointer feature fetch      →  all-to-all exchange_gather from
                                         the node-range-sharded HBM store
  DDP gradient all-reduce             →  explicit lax.psum of grads
  per-GPU seed partition              →  seeds batch axis sharded over mesh

The entire step is ONE jitted shard_map: sampling, relabel, the two
all-to-all hops, forward, backward, psum, Adam update — no host round
trips.  Params/opt state are replicated (out of shard_map they stay a
replicated pytree); the feature store is sharded by node range.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from dist_gnn_tpu.graph import Graph
from dist_gnn_tpu.parallel.feature_store import ShardedFeatureStore
from dist_gnn_tpu.parallel.graph_dist import ShardedGraph, sample_neighbors_cached
from dist_gnn_tpu.sampler import Block, sample_blocks
from dist_gnn_tpu.training.trainer import (
    TrainState,
    dist_masked_nll_loss,
    init_train_state,
    make_optimizer,
)


@dataclasses.dataclass(eq=False)
class DistTrainer:
    model: Any
    fan_out: Tuple[int, ...]
    store: ShardedFeatureStore
    lr: float = 1e-3
    weight_decay: float = 5e-4
    replace: bool = False
    axis_name: str = "data"
    # None → structure replicated per chip (fits-in-HBM case); a
    # ShardedGraph → owner-side all-to-all sampling (papers100M-scale case)
    sgraph: Optional[ShardedGraph] = None
    dedup_last: bool = True  # False = dedup-free final hop (faster, same math)
    sampler_window: Optional[int] = None  # windowed edge fetch (owner side)
    sampler_big_budget: Optional[int] = None
    # hops with fewer sampled slots than this (static, per chip) use the
    # exact elementwise fetch — small hops are latency-bound on the
    # windowed op chain (see sampler.sample_blocks docstring)
    window_min_slots: int = 65536
    relabel_mode: str = "auto"  # 'sort' | 'dense' | 'auto' (see sampler._relabel)
    frontier_caps: Optional[Tuple[int, ...]] = None  # per-hop static budgets
    # per-peer request-budget slack for the SAMPLING exchange (seeds can
    # cluster by node range far more than sampled frontiers do; overflow is
    # reported in metrics['sampler_overflow'] — raise this if nonzero)
    sampler_budget_slack: float = 4.0

    def __post_init__(self):
        self.optimizer = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.adam(self.lr),
        )
        self.mesh = self.store.mesh
        # the store's axis layout is authoritative (may be a
        # ('host', 'data') tuple on a two-tier mesh)
        self.axis_name = self.store.axis_name

    def init_state(self, key: jax.Array) -> TrainState:
        params = self.model.init(key)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _loss_fn(self, params, blocks, feats, labels, seed_mask, rng):
        return dist_masked_nll_loss(
            self.model, self.dedup_last, self.axis_name, params, blocks,
            feats, labels, seed_mask, rng,
        )

    def _sample_blocks_sharded(self, sgraph_blks, seeds, seed_mask, key):
        """Per-layer owner-side sampling + local relabel (inside shard_map).

        Mirrors sampler.sample_blocks but the neighbor fetch routes through
        the hot cache / all-to-all sharded structure instead of a local HBM
        gather.  Carries the single-chip sampler optimizations (windowed
        edge fetch, relabel-mode choice, frontier caps) to the dist path.

        Returns ``(blocks, stats)`` with traced overflow counters:
        ``sampler_overflow`` (exchange budget + windowed big-row budget +
        alias shortfall) and ``frontier_overflow`` (frontier-cap drops).
        """
        from dist_gnn_tpu.parallel.feature_store import request_budget
        from dist_gnn_tpu.sampler import _no_dedup_block, _relabel, _truncate_frontier

        blocks = []
        samp_ovf = jnp.int32(0)
        front_ovf = jnp.int32(0)
        keys = jax.random.split(key, len(self.fan_out))
        n_shards = self.store.num_shards
        for i, k in enumerate(reversed(list(self.fan_out))):
            # biased hops always take the window (sampler.sample_blocks
            # rationale: the windowed Gumbel path fetches per ROW, the
            # elementwise alias path per DRAW)
            hop_window = (
                self.sampler_window
                if (
                    self.sgraph.probs is not None
                    or seeds.shape[0] * k >= self.window_min_slots
                )
                else None
            )
            nb, ovf = sample_neighbors_cached(
                self.sgraph,
                sgraph_blks,
                seeds,
                seed_mask,
                k,
                self.replace,
                keys[i],
                budget=request_budget(
                    seeds.shape[0], n_shards, self.sampler_budget_slack
                ),
                window=hop_window,
                big_row_budget=(
                    self.sampler_big_budget if hop_window is not None else None
                ),
            )
            samp_ovf = samp_ovf + ovf.astype(jnp.int32)
            if not self.dedup_last and i == len(self.fan_out) - 1:
                blocks.append(_no_dedup_block(seeds, seed_mask, nb))
                break
            rl = _relabel(
                self.sgraph.num_nodes, seeds, nb.ids, nb.mask, self.relabel_mode
            )
            neigh_mask = nb.mask
            if (
                self.frontier_caps is not None
                and self.frontier_caps[i] < rl.frontier.shape[0]
            ):
                budget = self.frontier_caps[i]
                assert budget >= seeds.shape[0], (
                    f"frontier cap {budget} must cover the {seeds.shape[0]} seeds"
                )
                frontier, frontier_mask, num_frontier, slots, keep, fovf = (
                    _truncate_frontier(rl, budget)
                )
                neigh_mask = neigh_mask & keep
                front_ovf = front_ovf + fovf.astype(jnp.int32)
            else:
                frontier, frontier_mask, num_frontier, slots = (
                    rl.frontier,
                    rl.frontier_mask,
                    rl.num_frontier,
                    rl.neigh_slots,
                )
            blocks.append(
                Block(
                    seeds=seeds,
                    seed_mask=seed_mask,
                    frontier=frontier,
                    frontier_mask=frontier_mask,
                    num_frontier=num_frontier,
                    neigh_slots=slots,
                    neigh_mask=neigh_mask,
                )
            )
            seeds = frontier
            seed_mask = frontier_mask
        return tuple(blocks), {
            "sampler_overflow": samp_ovf,
            "frontier_overflow": front_ovf,
        }

    def _per_chip_step(
        self, state, graph, store_args, labels_shard, seeds, seed_mask, key
    ):
        k_sample, k_drop = jax.random.split(
            jax.random.fold_in(
                jax.random.fold_in(key, state.step),
                jax.lax.axis_index(self.axis_name),
            )
        )
        if self.sgraph is not None:
            blocks, samp_stats = self._sample_blocks_sharded(
                graph, seeds, seed_mask, k_sample
            )
        else:
            blocks, samp_stats = sample_blocks(
                graph, seeds, seed_mask, tuple(self.fan_out), self.replace, k_sample,
                relabel_mode=self.relabel_mode,
                frontier_caps=self.frontier_caps,
                dedup_last=self.dedup_last,
                window=self.sampler_window,
                big_row_budget=self.sampler_big_budget,
            )
        inp = blocks[-1]
        L = inp.frontier.shape[0]
        budget = self.store.request_budget_for(L)
        feats, overflow = self.store.fetch_local(
            store_args, inp.frontier, inp.frontier_mask, budget=budget
        )
        feats = self.store.dequantize(feats)
        # labels live in the same node-range sharding (1-col store)
        lab, _ = self.store_labels_fetch(labels_shard, seeds, seed_mask)
        lab = lab[:, 0].astype(jnp.int32)

        (loss, (acc_sum, denom)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True
        )(state.params, blocks, feats, lab, seed_mask, k_drop)
        loss = jax.lax.psum(loss, self.axis_name)
        acc = jax.lax.psum(acc_sum, self.axis_name) / denom
        grads = jax.lax.psum(grads, self.axis_name)
        overflow = jax.lax.psum(overflow, self.axis_name)
        samp_stats = jax.tree.map(
            lambda v: jax.lax.psum(v, self.axis_name), samp_stats
        )

        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {
            "loss": loss, "acc": acc, "overflow": overflow, **samp_stats
        }

    def _per_chip_eval(self, params, graph, store_args, labels_shard, seeds, seed_mask, key):
        k_sample = jax.random.fold_in(key, jax.lax.axis_index(self.axis_name))
        if self.sgraph is not None:
            blocks, _ = self._sample_blocks_sharded(graph, seeds, seed_mask, k_sample)
        else:
            blocks, _ = sample_blocks(
                graph, seeds, seed_mask, tuple(self.fan_out), self.replace, k_sample,
                relabel_mode=self.relabel_mode,
                frontier_caps=self.frontier_caps,
                dedup_last=self.dedup_last,
                window=self.sampler_window,
                big_row_budget=self.sampler_big_budget,
            )
        inp = blocks[-1]
        budget = self.store.request_budget_for(inp.frontier.shape[0])
        feats, _ = self.store.fetch_local(
            store_args, inp.frontier, inp.frontier_mask, budget=budget
        )
        feats = self.store.dequantize(feats)
        lab, _ = self.store_labels_fetch(labels_shard, seeds, seed_mask)
        lab = lab[:, 0].astype(jnp.int32)
        logits = self.model.apply(
            params, tuple(reversed(blocks)), feats, train=False,
            contiguous_first=not self.dedup_last,
        )
        correct = (
            jnp.argmax(logits, axis=-1).astype(jnp.int32) == lab
        ) & seed_mask
        return (
            jax.lax.psum(jnp.sum(correct.astype(jnp.int32)), self.axis_name),
            jax.lax.psum(jnp.sum(seed_mask.astype(jnp.int32)), self.axis_name),
        )

    def eval_step(self, params, graph, labels, seeds, seed_mask, key):
        """Distributed sampled eval: (correct, total), replicated."""
        return self._eval_step_impl(
            params, graph, self.store.shard_args(), labels, seeds, seed_mask,
            key,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _eval_step_impl(
        self, params, graph, store_args, labels, seeds, seed_mask, key
    ):
        ax = self.axis_name
        if self.sgraph is not None:
            graph_spec = self.sgraph.shard_specs()
        else:
            graph_spec = jax.tree.map(lambda _: P(), graph)
        return jax.shard_map(
            self._per_chip_eval,
            mesh=self.mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), params),
                graph_spec,
                self.store.shard_specs(),
                P(ax, None),
                P(ax),
                P(ax),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, graph, store_args, labels, seeds, seed_mask, key)

    def train_step_multi(self, state, graph, labels, seeds, seed_masks, key):
        return self._train_step_multi_impl(
            state, graph, self.store.shard_args(), labels, seeds, seed_masks,
            key,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _train_step_multi_impl(
        self, state, graph, store_args, labels, seeds, seed_masks, key
    ):
        """U consecutive distributed train steps fused into one jitted
        program (``seeds``/``seed_masks``: [U, world_batch] sharded over
        the mesh axis on the batch dim).  Same math as U sequential
        :meth:`train_step` calls; fusing amortizes per-call dispatch and
        lets XLA schedule across sub-steps (single-chip Trainer measured
        9.56 -> 8.20 ms/step at U=8 — probe_step19).  Metrics are the last
        sub-step's, with overflow counters summed."""
        U = seeds.shape[0]
        ovf_keys = ("overflow", "sampler_overflow", "frontier_overflow")
        totals = {k: jnp.int32(0) for k in ovf_keys}
        metrics = {}
        for u in range(U):
            state, metrics = self._train_step_impl.__wrapped__(
                self, state, graph, store_args, labels, seeds[u],
                seed_masks[u], key,
            )
            for k in ovf_keys:
                if k in metrics:
                    totals[k] = totals[k] + jnp.asarray(metrics[k], jnp.int32)
        return state, {**metrics, **totals}

    def store_labels_fetch(self, labels_shard, seeds, seed_mask):
        from dist_gnn_tpu.parallel.feature_store import exchange_gather

        # lossless budget: a chip's seed slice may cluster in one shard
        # (e.g. range-partitioned train ids), and label payloads are tiny
        return exchange_gather(
            labels_shard,
            seeds,
            seed_mask,
            self.axis_name,
            self.store.shard_size,
            budget=seeds.shape[0],
        )

    def train_step(self, state, graph, labels, seeds, seed_mask, key):
        """seeds/seed_mask: global [world_batch] arrays sharded over the
        mesh axis; labels: [padded_rows, 1] sharded by node range like the
        feature store; graph: a replicated Graph, or (when ``self.sgraph``
        is set) ``sgraph.shard_args()`` sharded over the mesh axis.

        The store's shard args are threaded as explicit jit arguments (not
        trace-time constants): closure constants are forbidden over a
        multi-process mesh and serialize into the compile request on the
        tunneled backend (NOTES.md #8)."""
        return self._train_step_impl(
            state, graph, self.store.shard_args(), labels, seeds, seed_mask,
            key,
        )

    @partial(jax.jit, static_argnames=("self",))
    def _train_step_impl(
        self, state, graph, store_args, labels, seeds, seed_mask, key
    ):
        ax = self.axis_name
        if self.sgraph is not None:
            graph_spec = self.sgraph.shard_specs()
        else:
            graph_spec = jax.tree.map(lambda _: P(), graph)
        return jax.shard_map(
            self._per_chip_step,
            mesh=self.mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), state),
                graph_spec,
                self.store.shard_specs(),  # feature shard (+hot tier)
                P(ax, None),  # labels shard
                P(ax),  # seeds
                P(ax),  # seed mask
                P(),  # rng key
            ),
            out_specs=(
                jax.tree.map(lambda _: P(), state),
                {
                    "loss": P(), "acc": P(), "overflow": P(),
                    "sampler_overflow": P(), "frontier_overflow": P(),
                },
            ),
            check_vma=False,
        )(state, graph, store_args, labels, seeds, seed_mask, key)
