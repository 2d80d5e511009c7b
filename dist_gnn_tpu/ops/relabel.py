"""Unique + relabel with static capacity (sort-based compaction).

TPU redesign of ``TensorRelabelCUDA`` (``src/sampling/cuda/tensor_relabel.cu:
182-205``): the reference hash-inserts [seeds, coo_col] into a CAS hashmap
keeping the minimum original position, flags first occurrences, scans, and
compacts — producing an nnz-sized frontier where seeds occupy the first
slots (the invariant ``sampler.cc:27-33`` relies on to chain layers).

XLA wants static shapes, so here:

  * capacity is fixed at ``num_seeds + num_seeds*k``; the frontier is padded
    with INVALID_ID and carries a validity mask + a traced count.
  * **positional seeds-first invariant**: frontier[i] == seeds[i] for
    i < num_seeds *including padding slots*, so layer chaining is pure
    slicing.  New unique neighbor ids follow from slot num_seeds, ordered by
    ascending id (order within the tail is semantically irrelevant; the
    reference orders by first occurrence).
  * dedup is a single stable int64 sort of (id << 32 | position) + scans —
    no atomics, no hashmap.

Returns relabeled neighbor slot indices into the frontier; a neighbor equal
to some seed maps to that seed's slot, duplicates map to one slot.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dist_gnn_tpu.graph import INVALID_ID


class RelabeledFrontier(NamedTuple):
    frontier: jnp.ndarray  # [num_seeds + B*k] int32 global ids, INVALID padded
    frontier_mask: jnp.ndarray  # [capacity] bool
    num_frontier: jnp.ndarray  # [] int32 — count of valid frontier entries
    neigh_slots: jnp.ndarray  # [B, k] int32 — neighbor positions in frontier
    # (only meaningful where the input neighbor mask was True)


# Fast-path bound for the sort-payload variant: the forward-fill packs
# (group, leader position) as ``seg * (cap + 1) + pos`` in int32, so it
# needs cap * (cap + 1) < 2**31.
_PACKED_CAP_LIMIT = 46_339


@jax.jit
def unique_and_relabel(
    seeds: jnp.ndarray,  # [S] int32, INVALID padded
    neigh_ids: jnp.ndarray,  # [B, k] int32 global ids, INVALID on masked slots
    neigh_mask: jnp.ndarray,  # [B, k] bool
) -> RelabeledFrontier:
    S = seeds.shape[0]
    B, k = neigh_ids.shape
    cap = S + B * k

    flat_n = jnp.where(neigh_mask.reshape(-1), neigh_ids.reshape(-1), INVALID_ID)
    ids = jnp.concatenate([seeds, flat_n])  # [cap]
    pos = jnp.arange(cap, dtype=jnp.int32)
    valid = ids != INVALID_ID

    if cap <= _PACKED_CAP_LIMIT:
        # Sort-payload formulation: no random gathers/scatters at all.
        # The multi-operand stable sort carries positions alongside ids
        # (replacing the ids[s_pos] gather); the leader's position is
        # forward-filled by a cummax of the monotonic packed code
        # ``seg * (cap + 1) + s_pos`` (replacing the s_pos[lead_idx]
        # gather); the back-permutation is a second sort keyed on s_pos
        # (replacing the [cap]-element scatter).  ~2x faster at hop-2
        # scale on v5e: random element gathers run ~75M/s while XLA's
        # int32 sort runs ~640M el/s (scripts/probe_step15/19.py).
        s_ids, s_pos = jax.lax.sort((ids, pos), num_keys=1, is_stable=True)
        s_valid = s_ids != INVALID_ID
        first = s_valid & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), s_ids[1:] != s_ids[:-1]]
        )
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # group idx, monotone
        code = jnp.where(first, seg * (cap + 1) + s_pos, -1)
        lead_pos = jax.lax.cummax(code) % (cap + 1)  # leader's s_pos, filled

        lead_is_seed = lead_pos < S
        is_new_group = first & (~lead_is_seed)
        new_rank = jnp.cumsum(is_new_group.astype(jnp.int32)) - 1
        group_slot = jnp.where(lead_is_seed, lead_pos, S + new_rank)
        slot_sorted = jnp.where(s_valid, group_slot, 0)
        # un-permute via a second sort keyed on the original position
        _, slots = jax.lax.sort((s_pos, slot_sorted), num_keys=1)
        slots = jnp.where(valid, slots, 0)
    else:
        # Stable argsort == lexicographic (id, position) order without any
        # int64 key packing (x64 stays disabled).
        s_pos = jnp.argsort(ids, stable=True).astype(jnp.int32)
        s_ids = ids[s_pos]
        s_valid = s_ids != INVALID_ID

        first = s_valid & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), s_ids[1:] != s_ids[:-1]]
        )
        # forward-fill index of the last group leader
        lead_idx = jax.lax.cummax(jnp.where(first, pos, -1))
        lead_pos = s_pos[jnp.clip(lead_idx, 0, cap - 1)]  # min pos of group

        lead_is_seed = lead_pos < S
        is_new_group = first & (~lead_is_seed)
        new_rank = jnp.cumsum(is_new_group.astype(jnp.int32)) - 1
        group_slot = jnp.where(lead_is_seed, lead_pos, S + new_rank)
        # propagate the leader's slot to every member (new_rank is constant
        # within a group after the leader: cumsum only bumps at new leaders)
        slot_sorted = jnp.where(s_valid, group_slot, INVALID_ID)

        # scatter back to original order
        slots = jnp.zeros((cap,), jnp.int32).at[s_pos].set(slot_sorted)
        slots = jnp.where(valid, slots, 0)

    num_new = jnp.sum(is_new_group.astype(jnp.int32))
    num_seed_valid = jnp.sum((seeds != INVALID_ID).astype(jnp.int32))

    # frontier: seeds occupy [0, S) positionally; each new unique id is
    # scattered at S + rank (targets are distinct; non-leaders aim out of
    # bounds and are dropped).
    scatter_to = jnp.where(is_new_group, S + new_rank, cap)
    tail = (
        jnp.full((cap,), INVALID_ID, jnp.int32)
        .at[scatter_to]
        .set(s_ids, mode="drop", unique_indices=True)
    )
    seed_region = jnp.concatenate([seeds, jnp.full((cap - S,), INVALID_ID, jnp.int32)])
    frontier = jnp.where(jnp.arange(cap) < S, seed_region, tail)

    frontier_mask = jnp.where(
        jnp.arange(cap) < S,
        frontier != INVALID_ID,
        jnp.arange(cap) < S + num_new,
    )
    num_frontier = num_seed_valid + num_new

    neigh_slots = slots[S:].reshape(B, k)
    return RelabeledFrontier(
        frontier=frontier,
        frontier_mask=frontier_mask,
        num_frontier=num_frontier,
        neigh_slots=jnp.where(neigh_mask, neigh_slots, 0),
    )


@partial(jax.jit, static_argnames=("num_nodes",))
def unique_and_relabel_dense(
    seeds: jnp.ndarray,  # [S] int32, INVALID padded; assumed pairwise unique
    neigh_ids: jnp.ndarray,  # [B, k]
    neigh_mask: jnp.ndarray,  # [B, k]
    num_nodes: int,
) -> RelabeledFrontier:
    """Sort-free unique+relabel via dense scatter/cumsum over [num_nodes].

    Same contract as :func:`unique_and_relabel` (new ids are ordered by
    ascending node id in the tail, identical to the sort variant), but
    costs O(num_nodes + cap) bandwidth-bound passes instead of an
    O(cap log cap) sort — the right trade whenever ``num_nodes`` is within
    a small factor of the frontier capacity (XLA's int sort is many passes;
    a cumsum over [N] is ~3).  Memory: two transient [N] i32 buffers.
    """
    S = seeds.shape[0]
    B, k = neigh_ids.shape
    cap = S + B * k

    seeds_valid = seeds != INVALID_ID
    flat_ids = neigh_ids.reshape(-1)
    flat_mask = neigh_mask.reshape(-1)
    safe_flat = jnp.where(flat_mask, flat_ids, 0)

    # seed slot per node (INVALID marker where not a seed); padded seed
    # entries scatter out of range and are dropped
    seed_slot = jnp.full((num_nodes,), INVALID_ID, jnp.int32)
    seed_scatter_to = jnp.where(seeds_valid, seeds, num_nodes)
    seed_slot = seed_slot.at[seed_scatter_to].set(
        jnp.arange(S, dtype=jnp.int32), mode="drop"
    )

    # mark nodes referenced by valid neighbors that are not seeds
    mark = jnp.zeros((num_nodes,), jnp.int32)
    neigh_scatter_to = jnp.where(flat_mask, flat_ids, num_nodes)
    mark = mark.at[neigh_scatter_to].set(1, mode="drop")
    is_new = (mark == 1) & (seed_slot == INVALID_ID)

    # rank of each new node (ascending node id), and its frontier slot
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    num_new = jnp.where(is_new.shape[0] > 0, rank[-1] + 1, 0)
    new_slot = S + rank
    node_slot = jnp.where(seed_slot != INVALID_ID, seed_slot, new_slot)

    neigh_slots = jnp.where(flat_mask, node_slot[safe_flat], 0).reshape(B, k)

    # frontier: seeds first (positionally), then new ids scattered at their slots
    tail = jnp.full((cap,), INVALID_ID, jnp.int32)
    ids_all = jnp.arange(num_nodes, dtype=jnp.int32)
    tail_to = jnp.where(is_new, new_slot, cap)
    tail = tail.at[tail_to].set(ids_all, mode="drop", unique_indices=True)
    seed_region = jnp.concatenate(
        [seeds, jnp.full((cap - S,), INVALID_ID, jnp.int32)]
    )
    pos = jnp.arange(cap, dtype=jnp.int32)
    frontier = jnp.where(pos < S, seed_region, tail)
    frontier_mask = jnp.where(
        pos < S, frontier != INVALID_ID, pos < S + num_new
    )
    num_frontier = jnp.sum(seeds_valid.astype(jnp.int32)) + num_new
    return RelabeledFrontier(
        frontier=frontier,
        frontier_mask=frontier_mask,
        num_frontier=num_frontier.astype(jnp.int32),
        neigh_slots=neigh_slots,
    )
