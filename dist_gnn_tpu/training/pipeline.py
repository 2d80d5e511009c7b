"""Double-buffered training pipeline over the host-resident base tier.

The reference overlaps nothing explicitly — UVA loads inside kernels hide
host reads behind the memory system.  On TPU the equivalent latency hiding
is *software pipelining across batches*:

    sample(i+1)  [device] ──┐
    readback frontier(i+1)  │  (waits only on sampling)
    queue compute(i)        │  [device, async dispatch]
    stage misses(i+1)  [host gather + async device_put]  ← overlaps compute(i)

so the steady-state step time is ``sample + max(compute, staging)`` instead
of their sum.  ``jax.device_put`` returns before the H2D copy completes and
XLA orders it before the next compute that consumes it.

Two structure modes:
  * device-resident structure (Graph in HBM): sampling is one fused jit —
    the common papers100M-on-a-pod case (features host-resident only);
  * host-resident structure (:class:`~dist_gnn_tpu.host_tier.HostCSCStore`):
    per-hop staging — hot rows sample from the HBM sub-CSR, miss rows'
    adjacency windows ship up per hop (graph bigger than HBM end-to-end).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dist_gnn_tpu.graph import Graph
from dist_gnn_tpu.host_tier import (
    HostCSCStore,
    HostFeatureStore,
    assemble_features,
    sample_staged_hop,
)
from dist_gnn_tpu.sampler import _no_dedup_block, _relabel, sample_blocks
from dist_gnn_tpu.training.trainer import (
    TrainState,
    init_train_state,
    make_optimizer,
    masked_nll_loss,
)


@dataclasses.dataclass(eq=False)
class HostTierTrainer:
    """Trainer whose feature base (and optionally structure) is host-resident.

    API mirrors training.Trainer but the step is split into jitted
    ``sample``/``compute`` phases with host staging between them, driven by
    :meth:`train_batches` (double-buffered).
    """

    model: Any
    fan_out: Tuple[int, ...]
    store: HostFeatureStore
    gstore: Optional[HostCSCStore] = None  # None → structure passed as Graph
    lr: float = 1e-3
    weight_decay: float = 5e-4
    replace: bool = False
    relabel_mode: str = "auto"
    dedup_last: bool = True
    sampler_window: Optional[int] = None
    sampler_big_budget: Optional[int] = None

    def __post_init__(self):
        self.optimizer = make_optimizer(self.lr, self.weight_decay)
        if self.replace and self.gstore is not None:
            # the staged-hop samplers (hot-tier Feistel, staged windows,
            # host hub presampling) are without-replacement only; honoring
            # the flag silently elsewhere would train a different
            # distribution than configured
            raise NotImplementedError(
                "replace=True is not supported with host-resident "
                "structure (gstore)"
            )

    def init_state(self, key: jax.Array) -> TrainState:
        return init_train_state(self.model, self.optimizer, key)

    # ---- sampling phase --------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _sample_device(self, graph, seeds, seed_mask, key):
        return sample_blocks(
            graph, seeds, seed_mask, tuple(self.fan_out), self.replace, key,
            relabel_mode=self.relabel_mode,
            dedup_last=self.dedup_last,
            window=self.sampler_window,
            big_row_budget=self.sampler_big_budget,
        )

    @partial(jax.jit, static_argnames=("self", "k", "last"))
    def _hop(self, hot_graph, seeds, seed_mask, local_rows, staged, k, last, key):
        nb = sample_staged_hop(hot_graph, local_rows, staged, k, key)
        if last and not self.dedup_last:
            return _no_dedup_block(seeds, seed_mask, nb)
        rl = _relabel(
            self.gstore.hg.num_nodes, seeds, nb.ids, nb.mask, self.relabel_mode
        )
        from dist_gnn_tpu.sampler import Block

        return Block(
            seeds=seeds,
            seed_mask=seed_mask,
            frontier=rl.frontier,
            frontier_mask=rl.frontier_mask,
            num_frontier=rl.num_frontier,
            neigh_slots=rl.neigh_slots,
            neigh_mask=nb.mask,
        )

    def _sample_host_structure(self, seeds_np, mask_np, key, rng):
        """Per-hop staged sampling (host-resident structure).

        Hop boundaries are host round-trips by necessity (the next hop's
        seeds decide what adjacency to stage) — matching the reference's
        per-layer nnz readbacks (``rowwise_sampling_p2p.cu:224-228``).
        Returns (blocks tuple, host-side stats dict, final frontier np).
        """
        blocks = []
        stats = {"struct_miss": 0, "struct_overflow": 0}
        seeds_h, mask_h = np.asarray(seeds_np), np.asarray(mask_np)
        keys = jax.random.split(key, len(self.fan_out))
        for i, k in enumerate(reversed(list(self.fan_out))):
            local_rows, staged = self.gstore.plan_hop(seeds_h, mask_h, k, rng)
            stats["struct_miss"] += staged.count
            stats["struct_overflow"] += staged.overflow
            last = i == len(self.fan_out) - 1
            blk = self._hop(
                self.gstore.hot_graph,
                jnp.asarray(seeds_h),
                jnp.asarray(mask_h),
                jnp.asarray(local_rows),
                staged,
                k,
                last,
                keys[i],
            )
            blocks.append(blk)
            if not last:
                seeds_h = np.asarray(blk.frontier)
                mask_h = np.asarray(blk.frontier_mask)
        inp = blocks[-1]
        return (
            tuple(blocks),
            stats,
            np.asarray(inp.frontier),
            np.asarray(inp.frontier_mask),
        )

    # ---- compute phase ---------------------------------------------------

    def _loss_fn(self, params, blocks, feats, labels, seed_mask, rng):
        return masked_nll_loss(
            self.model, self.dedup_last, params, blocks, feats, labels,
            seed_mask, rng,
        )

    @partial(jax.jit, static_argnames=("self",))
    def compute_step(
        self, state, hot_tier, blocks, staged_rows, staged_slots,
        labels_b, seed_mask, key,
    ):
        """Fused assemble + forward + backward + Adam (one jit)."""
        inp = blocks[-1]
        feats = assemble_features(
            hot_tier, inp.frontier, inp.frontier_mask, staged_rows, staged_slots
        )
        (loss, acc), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, blocks, feats, labels_b, seed_mask, key
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    # ---- pipeline driver -------------------------------------------------

    def train_batches(
        self,
        state: TrainState,
        graph: Optional[Graph],  # device structure (None when gstore is set)
        labels_np: np.ndarray,  # [N] host labels
        batches,  # iterable of (seeds_np, mask_np)
        key: jax.Array,
    ):
        """Run all batches double-buffered; returns (state, metrics list).

        Per-batch metrics include host-side staging counters
        (``feat_miss``/``feat_overflow`` and, with host structure,
        ``struct_miss``/``struct_overflow``).
        """
        pend = None
        metrics = []
        rng = np.random.default_rng(np.uint32(jax.random.key_data(key)[-1]))
        for i, (seeds_np, mask_np) in enumerate(batches):
            seeds_np = np.asarray(seeds_np)
            mask_np = np.asarray(mask_np)
            k_i = jax.random.fold_in(key, i)
            host_stats = {}
            if self.gstore is not None:
                blocks, host_stats, frontier_np, fmask_np = (
                    self._sample_host_structure(seeds_np, mask_np, k_i, rng)
                )
            else:
                blocks, sstats = self._sample_device(
                    graph, jnp.asarray(seeds_np), jnp.asarray(mask_np), k_i
                )
                # thread the sampler overflow counters into the metrics —
                # an undersized big-row budget must be observable, never a
                # silent edge drop (sample_blocks' own contract); the int()
                # costs nothing extra, the frontier readback already syncs
                host_stats["sampler_overflow"] = int(sstats["sampler_overflow"])
                host_stats["frontier_overflow"] = int(sstats["frontier_overflow"])
                frontier_np = np.asarray(blocks[-1].frontier)  # sync: sampling
                fmask_np = np.asarray(blocks[-1].frontier_mask)
            if pend is not None:
                args, stats_prev = pend
                state, m = self.compute_step(state, *args)  # async dispatch
                metrics.append({**m, **stats_prev})
            # host gather + async H2D ride under the queued compute
            staged = self.store.stage(frontier_np, fmask_np)
            host_stats["feat_miss"] = staged.count
            host_stats["feat_overflow"] = staged.overflow
            lab = labels_np[np.where(mask_np, seeds_np, 0)].astype(np.int32)
            pend = (
                (
                    self.store.hot_tier,
                    blocks,
                    staged.rows,
                    staged.slots,
                    jnp.asarray(lab),
                    jnp.asarray(mask_np),
                    jax.random.fold_in(k_i, 1),
                ),
                host_stats,
            )
        if pend is not None:
            args, stats_prev = pend
            state, m = self.compute_step(state, *args)
            metrics.append({**m, **stats_prev})
        return state, metrics
