"""Sharded feature store with owner-bucketed all-to-all row exchange.

This is the TPU replacement for the reference's core data plane — the
``TensorP2PServer`` peer-pointer store whose device-side ``At(device_id,
index)`` dereferences another GPU's HBM inside a kernel
(``src/cache/tensor_p2p_cache.h:11-73``).  TPUs cannot dereference a peer
chip's memory, so the per-element pull becomes a *batched exchange*:

  1. each chip buckets the node ids it needs by owner shard
     (owner = nid // shard_size — no hashmap needed for the base store),
  2. a fixed-budget ``all_to_all`` ships request ids to owners over ICI,
  3. owners gather rows from their local HBM shard,
  4. a second ``all_to_all`` ships rows back, and an inverse permutation
     restores request order.

Everything is static-shape: per-peer budget ``P`` with an overflow counter
(requests beyond P are dropped and reported — size P so that overflow is
impossible when ``P == len(ids)``, or rely on the uniform spread of ids for
tighter budgets; see ``request_budget``).

Runs inside ``shard_map`` (see trainer_dist.py) so the exchange fuses into
the surrounding per-chip step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dist_gnn_tpu.graph import INVALID_ID


def shard_rows(num_rows: int, num_shards: int) -> int:
    """Rows per shard (ceil) — owner = nid // shard_size."""
    return -(-num_rows // num_shards)


def request_budget(num_ids: int, num_shards: int, slack: float = 2.0) -> int:
    """Per-peer request budget.  Ids of a sampled frontier are spread across
    shards roughly uniformly; slack 2.0 makes overflow astronomically rare
    while keeping the exchange volume ~2x the ideal ragged size.  Set
    ``slack * num_shards >= num_ids`` for a provably lossless exchange."""
    return min(num_ids, max(1, int(-(-num_ids // num_shards) * slack)))


class ExchangePlan(NamedTuple):
    """Bookkeeping to map an all-to-all response back to request order."""

    order: Optional[jnp.ndarray]  # unused (sort-free bucketing); kept for ABI
    slot: jnp.ndarray  # [L] position in the flattened [n*P] request table,
    # indexed in ORIGINAL request order
    in_budget: jnp.ndarray  # [L] bool
    budget: int
    num_peers: int


def make_request(
    ids: jnp.ndarray,  # [L] global ids needed on this chip (INVALID padded)
    mask: jnp.ndarray,  # [L]
    axis_name: str,
    shard_size: int,
    budget: int,
    owners: Optional[jnp.ndarray] = None,  # [L] explicit owner per id
) -> Tuple[ExchangePlan, jnp.ndarray, jnp.ndarray]:
    """Bucket ids by owner and all-to-all the request table.

    Returns (plan, recv[n, P] — the ids peers want from *this* chip,
    overflow count).  The request/serve/response split lets callers decide
    what the owner computes per requested row (a feature gather, a neighbor
    sample, ...) before calling :func:`return_response`.

    ``owners`` overrides the default node-range routing (``nid //
    shard_size``) — used by the hierarchical exchange (route by owner
    *host*) and the peer-hot-tier exchange (route by the cache plan's
    owner table).
    """
    n = jax.lax.axis_size(axis_name)
    L = ids.shape[0]
    Pb = budget

    # Owner bucketing WITHOUT a sort: owners live in [0, n) with n small,
    # so per-element ranks come from n masked cumsums (O(n*L) VPU work)
    # instead of an O(L log L) multi-pass XLA sort — the sort dominated the
    # exchange at frontier sizes (~13 ms at L=540k vs ~1 ms for this).
    if owners is None:
        owner = jnp.where(mask, jnp.clip(ids // shard_size, 0, n - 1), n)
    else:
        owner = jnp.where(mask & (owners >= 0) & (owners < n), owners, n)
    if n <= 16:
        # [n, L] masked cumsum — cheapest for small meshes
        is_owner = (
            owner[None, :] == jnp.arange(n, dtype=owner.dtype)[:, None]
        )  # [n, L]
        rank_per = jnp.cumsum(is_owner.astype(jnp.int32), axis=1) - 1
        r = jnp.sum(jnp.where(is_owner, rank_per, 0), axis=0)  # [L]
    else:
        # large meshes: the [n, L] intermediate outgrows the sort it avoids
        order = jnp.argsort(owner, stable=True)
        s_owner = owner[order]
        first = jnp.searchsorted(s_owner, s_owner, side="left")
        r_sorted = jnp.arange(L, dtype=jnp.int32) - first.astype(jnp.int32)
        r = jnp.zeros((L,), jnp.int32).at[order].set(r_sorted)
    valid = mask & (owner < n)
    in_budget = valid & (r < Pb)
    slot = jnp.where(in_budget, owner.astype(jnp.int32) * Pb + r, n * Pb)
    req = (
        jnp.full((n * Pb,), INVALID_ID, jnp.int32)
        .at[slot]
        .set(jnp.where(valid, ids, INVALID_ID), mode="drop", unique_indices=True)
        .reshape(n, Pb)
    )
    overflow = jnp.sum((valid & ~in_budget).astype(jnp.int32))
    recv = jax.lax.all_to_all(req, axis_name, 0, 0, tiled=True)  # [n, Pb]
    plan = ExchangePlan(
        order=None, slot=slot, in_budget=in_budget, budget=Pb, num_peers=n
    )
    return plan, recv, overflow


def return_response(
    plan: ExchangePlan,
    served: jnp.ndarray,  # [n, P, ...] — owner-computed payload per recv id
    axis_name: str,
    fill=0,
):
    """All-to-all the served payload back and restore request order.

    Returns [L, ...]; masked / overflowed slots are ``fill``.
    """
    resp = jax.lax.all_to_all(served, axis_name, 0, 0, tiled=True)
    n, Pb = resp.shape[0], resp.shape[1]
    tail = resp.shape[2:]
    flat = resp.reshape((n * Pb,) + tail)
    idx = jnp.clip(plan.slot, 0, n * Pb - 1)
    # slot is already in original request order — a direct gather restores it
    return jnp.where(
        plan.in_budget.reshape((-1,) + (1,) * len(tail)), flat[idx], fill
    )


def exchange_gather(
    local_shard: jnp.ndarray,  # [shard_size, F] — this chip's row range
    ids: jnp.ndarray,  # [L] global ids needed here (INVALID padded)
    mask: jnp.ndarray,  # [L]
    axis_name: str,
    shard_size: int,
    budget: Optional[int] = None,
    lossless: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-chip body (call inside shard_map): returns ([L, F] rows,
    unserved_count).  Rows for masked-out ids are zeros.

    **Lossless** (round-4, SURVEY §7's "overflow spill to a second round"):
    requests beyond the per-peer budget are re-issued in follow-up spill
    rounds (a ``while_loop`` gated on the psum'd pending count) until every
    request is served — each round serves at least ``budget`` ids per
    (requester, owner) pair, so the loop terminates in
    ``ceil(max pair load / budget)`` rounds and costs nothing when the
    first round covers everything (the common case).  This matches the
    reference's never-drops semantics, where the UVA fallback serves every
    element (``src/feature/cuda/feature_ops.cu:38-73``).  The returned
    count is the residual UNSERVED total plus any masked-true ids outside
    the sharded table (structurally unservable, returned as zero rows) —
    0 when lossless and every requested id is in range.
    ``lossless=False`` restores single-round drop-and-count (used by the
    budget-accounting tests and the autotuner's overflow model).
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    if n == 1:
        # single-chip mesh: the shard IS the whole table — skip the
        # round-trip (request scatter + 2 all_to_alls + response reorder
        # cost a second full row gather, ~2x at bench shapes).  Ids
        # outside the table are zeros, COUNTED (never silent — module
        # contract)
        oor1 = jnp.sum(
            (mask & ((ids < 0) | (ids >= local_shard.shape[0]))).astype(
                jnp.int32
            )
        )
        in_range = mask & (ids >= 0) & (ids < local_shard.shape[0])
        safe = jnp.clip(ids, 0, local_shard.shape[0] - 1)
        rows = jnp.where(in_range[:, None], local_shard[safe], 0)
        return rows, oor1
    Pb = budget if budget is not None else request_budget(ids.shape[0], n)
    # out-of-range masked-true ids would be "served" clipped zeros by the
    # rounds below — zero their rows but keep them visible in the count
    mask_in = mask & (ids >= 0) & (ids < n * shard_size)
    oor = jnp.sum((mask & ~mask_in).astype(jnp.int32))
    mask = mask_in

    def one_round(pending, out):
        plan, recv, ovf = make_request(ids, pending, axis_name, shard_size, Pb)
        base = me * shard_size
        local_idx = recv - base
        serve = (
            (recv != INVALID_ID)
            & (local_idx >= 0)
            & (local_idx < local_shard.shape[0])
        )
        rows = jnp.where(
            serve[..., None],
            local_shard[jnp.clip(local_idx, 0, local_shard.shape[0] - 1)],
            0,
        )  # [n, Pb, F]
        got = return_response(plan, rows, axis_name)
        served = pending & plan.in_budget
        out = jnp.where(served[:, None], got, out)
        return pending & ~served, out, ovf

    out0 = jnp.zeros((ids.shape[0], local_shard.shape[1]), local_shard.dtype)
    pending, out, ovf = one_round(mask, out0)
    if not lossless:
        return out, ovf + oor
    remaining = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axis_name)

    def cond(c):
        return c[2] > 0

    def body(c):
        pending, out, _ = c
        pending, out, _ = one_round(pending, out)
        rem = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axis_name)
        return pending, out, rem

    pending, out, remaining = jax.lax.while_loop(
        cond, body, (pending, out, remaining)
    )
    return out, jnp.sum(pending.astype(jnp.int32)) + oor


def exchange_gather_hier(
    local_shard: jnp.ndarray,  # [shard_size, F] — this chip's row range
    ids: jnp.ndarray,  # [L]
    mask: jnp.ndarray,  # [L]
    host_axis: str,
    data_axis: str,
    shard_size: int,
    budget_host: Optional[int] = None,
    budget_data: Optional[int] = None,
    lossless: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage hierarchical exchange for a ('host', 'data') mesh.

    The reference's multi-node topology keeps the P2P cache *intra-node*
    and only DDP crosses nodes (``node_classification_dist.py:43-44``); the
    TPU analog separates the expensive DCN tier from cheap ICI:

      stage 1 (DCN): requests bucketed by *owner host* ride one
          ``all_to_all`` over the host axis, landing on the peer host's
          chip with the same intra-host index — each request crosses DCN
          exactly once, with a per-host budget (coarse, so hub-shard skew
          within a host does not blow the inter-host budget);
      stage 2 (ICI): the landed requests re-bucket by *owner chip* and ride
          an intra-host ``all_to_all``; the owner serves its HBM rows;
      responses retrace the two stages in reverse.

    Budgets default to ``request_budget`` per tier.  Returns
    ([L, F] rows, unserved_count — 0 when ``lossless`` and every
    masked-true id is inside the sharded table; out-of-range ids return
    zero rows and are counted, never silent).

    **Lossless spill** (round-4): a request can miss its first round at
    either stage (host-budget overflow, or stage-2 relay overflow on the
    remote host — invisible to the requester, so every served row carries
    a 1-flag in an extra payload column).  Unserved requests re-ride the
    full two-stage exchange in follow-up rounds until the psum'd pending
    count hits zero; each round serves at least the stage budgets per
    bucket pair, so termination is bounded by the worst pair load.
    """
    H = jax.lax.axis_size(host_axis)
    D = jax.lax.axis_size(data_axis)
    L = ids.shape[0]
    Bh = budget_host if budget_host is not None else request_budget(L, H)
    # stage-2 default is LOSSLESS given stage 1 (every relayed request may
    # be owned by a single chip — intra-host skew is structural, and ICI
    # volume is cheap relative to the DCN stage it protects)
    Bd = budget_data if budget_data is not None else H * Bh
    F = local_shard.shape[1]

    def one_round(pending, out):
        # owners are clipped like the flat path's (ADVICE r4): without it a
        # masked-true id outside the sharded range never sets its serve
        # flag and the lossless while_loop spins forever.  Belt-and-braces:
        # out-of-range ids are also removed from pending before round 1.
        owner_global = jnp.where(
            pending, jnp.clip(ids // shard_size, 0, H * D - 1), H * D
        )
        plan1, recv1, ovf1 = make_request(
            ids, pending, host_axis, shard_size, Bh, owners=owner_global // D
        )
        relay = recv1.reshape(-1)  # [H*Bh] requests now on the owner host
        rmask = relay != INVALID_ID
        owner_chip = jnp.where(rmask, (relay // shard_size) % D, D)
        plan2, recv2, ovf2 = make_request(
            relay, rmask, data_axis, shard_size, Bd, owners=owner_chip
        )
        # serve from the local shard (recv2 ids are owned by this chip)
        me = jax.lax.axis_index(host_axis) * D + jax.lax.axis_index(data_axis)
        local_idx = recv2 - me * shard_size
        serve = (
            (recv2 != INVALID_ID)
            & (local_idx >= 0)
            & (local_idx < local_shard.shape[0])
        )
        rows = jnp.where(
            serve[..., None],
            local_shard[jnp.clip(local_idx, 0, local_shard.shape[0] - 1)],
            0,
        )  # [D, Bd, F]
        # served flag rides back as one extra column (survives both stages;
        # the requester cannot otherwise tell a stage-2 drop from a zero row)
        payload = jnp.concatenate(
            [rows, serve[..., None].astype(rows.dtype)], axis=-1
        )
        back1 = return_response(plan2, payload, data_axis)  # [H*Bh, F+1]
        out2 = return_response(
            plan1, back1.reshape(H, Bh, F + 1), host_axis
        )  # [L, F+1]
        served = pending & plan1.in_budget & (out2[:, F] > 0)
        out = jnp.where(served[:, None], out2[:, :F], out)
        return pending & ~served, out, ovf1 + ovf2

    axes = (host_axis, data_axis)
    out0 = jnp.zeros((L, F), local_shard.dtype)
    # ids outside the sharded table are structurally unservable: return
    # zeros immediately instead of letting them circulate as pending —
    # but COUNT them into the returned unserved/overflow total (the
    # module contract is "a nonzero count means re-tune, never silent
    # data loss"; a silently-zeroed row would break it)
    mask_in = mask & (ids >= 0) & (ids < H * D * shard_size)
    oor = jnp.sum((mask & ~mask_in).astype(jnp.int32))
    pending, out, ovf = one_round(mask_in, out0)
    if not lossless:
        return out, ovf + oor
    remaining = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axes)

    def cond(c):
        return c[2] > 0

    def body(c):
        pending, out, _ = c
        pending, out, _ = one_round(pending, out)
        rem = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axes)
        return pending, out, rem

    pending, out, remaining = jax.lax.while_loop(
        cond, body, (pending, out, remaining)
    )
    return out, jnp.sum(pending.astype(jnp.int32)) + oor


def build_union_tables(
    hot_ids: np.ndarray,  # [n, C] per-chip cached ids, INVALID padded
    num_hosts: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the id → owning-chip routing tables for the peer-hot tier.

    ``num_hosts == 1``: one global table [U], owner in [0, n) — the flat
    mesh.  ``num_hosts == H``: per-HOST tables [H, U] with owner = the
    intra-host chip index in [0, D) — the reference's cache subgroup is
    intra-node (``node_classification_dist.py:43-44``), so rows hot only
    on another host are invisible to the peer tier and fall through to
    the base exchange.  Padded entries hold int32.max (sorted tail) and
    never match a real id.
    """
    from dist_gnn_tpu.ops.hashtable import SortedIdTable

    n, C = hot_ids.shape
    assert n % num_hosts == 0
    D = n // num_hosts
    pad_key = np.iinfo(np.int32).max
    tables = []
    for h in range(num_hosts):
        flat = hot_ids[h * D : (h + 1) * D].reshape(-1)
        owners = np.repeat(np.arange(D, dtype=np.int32), C)
        keep = flat != INVALID_ID
        tbl = SortedIdTable.build(
            flat[keep], owners=owners[keep], priority=owners[keep]
        )
        tables.append((np.asarray(tbl.sorted_ids), np.asarray(tbl.owners)))
    U = max(max((len(s) for s, _ in tables), default=1), 1)
    us = np.full((num_hosts, U), pad_key, np.int32)
    uo = np.zeros((num_hosts, U), np.int32)
    for h, (s, o) in enumerate(tables):
        us[h, : len(s)] = s
        uo[h, : len(o)] = o
    if num_hosts == 1:
        return us[0], uo[0]
    return us, uo


def peer_hot_fetch(
    axis_name, hot_sorted, hot_rows, union_sorted, union_owner, ids, mask,
    budget: int, lossless: bool = True,
):
    """Serve ids from the hot tier of the PEER that caches them (the
    reference's NVLink tier — a remote-cached row is fetched from the
    peer's cache, not the slow base: ``src/cache/tensor_p2p_cache.h:21-23``).
    Requests route by the replicated union owner table; each peer probes
    its own hot tier to serve.

    **Lossless** (default): budget-overflowed requests spill to follow-up
    rounds until every hot-somewhere id is served — required by the
    dist-host data plane, whose staging covers only not-hot-anywhere rows
    (a dropped peer request there has no fallback tier).  With
    ``lossless=False`` overflowed requests are left unserved
    (``served_mask`` False) for callers that route them to a base tier.

    Returns ([L, F] rows, served_mask [L]).  Call inside shard_map."""
    n = jax.lax.axis_size(axis_name)
    U = union_sorted.shape[0]
    upos = jnp.clip(jnp.searchsorted(union_sorted, ids), 0, max(U - 1, 0))
    hot_somewhere = mask & (U > 0) & (union_sorted[upos] == ids)
    owner = jnp.where(hot_somewhere, union_owner[upos], n)
    C = hot_sorted.shape[0]

    def one_round(pending, out):
        plan, recv, _ = make_request(
            ids, pending, axis_name, 1, budget, owners=owner
        )
        # serve received requests from MY hot tier
        rflat = recv.reshape(-1)
        spos = jnp.clip(jnp.searchsorted(hot_sorted, rflat), 0, max(C - 1, 0))
        serve_hit = (rflat != INVALID_ID) & (hot_sorted[spos] == rflat)
        rows = jnp.where(serve_hit[:, None], hot_rows[spos], 0).reshape(
            recv.shape[0], recv.shape[1], -1
        )
        got = return_response(plan, rows, axis_name)
        served_r = pending & plan.in_budget
        out = jnp.where(served_r[:, None], got, out)
        return pending & ~served_r, out

    out0 = jnp.zeros((ids.shape[0], hot_rows.shape[-1]), hot_rows.dtype)
    pending, out = one_round(hot_somewhere, out0)
    if not lossless:
        return out, hot_somewhere & ~pending
    remaining = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axis_name)

    def cond(c):
        return c[2] > 0

    def body(c):
        pending, out, _ = c
        pending, out = one_round(pending, out)
        rem = jax.lax.psum(jnp.sum(pending.astype(jnp.int32)), axis_name)
        return pending, out, rem

    pending, out, _ = jax.lax.while_loop(cond, body, (pending, out, remaining))
    return out, hot_somewhere & ~pending


class ShardedFeatureStore:
    """Feature matrix row-sharded over a mesh axis, fetched via
    :func:`exchange_gather`, with an optional heat-driven **hot tier**:
    per-chip cached rows served from local HBM without touching ICI.

    This is the feature half of the reference's cache design
    (``P2PCacheFeatureServer``, ``src/feature/feature_server.cc:10-61``):
    * selfish policy → every chip caches the same/its own hottest rows
      (local hits),
    * selfless policy → chips cache disjoint partitions; *local* hits skip
      the exchange, remote-cached rows still ride the all-to-all but that
      is exactly the NVLink-tier of the reference's cost model.
    The routing "hashmap" is a per-chip sorted-id table
    (ops/hashtable.py).

    Pass ``hot_ids`` as an [n, C] int32 array (per-chip cached node ids,
    INVALID_ID padded) from cache/policy.py plans.
    """

    def __init__(
        self,
        features: np.ndarray,
        mesh,
        axis_name: str = "data",
        budget_slack: float = 2.0,
        hot_ids: Optional[np.ndarray] = None,
        quantize: bool = False,
        hierarchical: bool = False,  # 2-stage DCN/ICI exchange (tuple axis)
        peer_hot: bool = False,  # serve misses from PEER hot tiers (selfless)
        lossless: bool = True,  # spill overflowed requests to extra rounds
    ):
        from dist_gnn_tpu.parallel.mesh import axis_size as _axis_size

        self.mesh = mesh
        self.axis_name = tuple(axis_name) if isinstance(axis_name, list) else axis_name
        self.hierarchical = hierarchical
        if hierarchical:
            assert (
                isinstance(self.axis_name, tuple) and len(self.axis_name) == 2
            ), "hierarchical exchange needs a ('host', 'data') axis pair"
        self.quantized = quantize
        self.lossless = lossless
        self.out_dim = features.shape[1]
        if quantize:
            from dist_gnn_tpu.ops.quantize import quantize_pack

            features = quantize_pack(features)
        self.num_rows = features.shape[0]
        n = _axis_size(mesh, axis_name)
        self.num_shards = n
        self.shard_size = shard_rows(self.num_rows, n)
        self.budget_slack = budget_slack
        padded = self.shard_size * n
        if padded != features.shape[0]:
            pad = np.zeros((padded - features.shape[0], features.shape[1]), features.dtype)
            features = np.concatenate([features, pad], axis=0)
        spec = P(axis_name, None)
        self.features = jax.device_put(features, NamedSharding(mesh, spec))
        self.pspec = spec

        self.hot_sorted = self.hot_slots = self.hot_rows = None
        self.union_sorted = self.union_owner = None
        self.peer_hot = peer_hot
        if hot_ids is not None:
            assert hot_ids.shape[0] == n
            C = hot_ids.shape[1]
            sorted_ids = np.sort(
                np.where(hot_ids == INVALID_ID, np.iinfo(np.int32).max, hot_ids), axis=1
            ).astype(np.int32)
            safe = np.clip(sorted_ids, 0, self.num_rows - 1)
            rows = features[safe.reshape(-1)].reshape(n, C, features.shape[1])
            rows[sorted_ids == INVALID_ID] = 0
            sh = NamedSharding(mesh, P(axis_name, None))
            sh3 = NamedSharding(mesh, P(axis_name, None, None))
            self.hot_sorted = jax.device_put(sorted_ids, sh)
            self.hot_rows = jax.device_put(rows, sh3)
            if peer_hot:
                # Union routing table: id -> owning chip.  The analog of
                # the reference's (key, idx, devid) hashmap
                # (``CreateNidsP2PCacheHashMapCUDA``, hashmap.cu:15-72);
                # duplicates resolve to the lowest chip (every chip probes
                # its LOCAL tier first, so the winner only matters for
                # remote routing, where any caching peer is equivalent).
                # Flat mesh: one replicated table, requests ride the full
                # axis.  Hierarchical mesh: PER-HOST tables — peer-hot
                # requests ride only the cheap intra-host data axis (the
                # reference's intra-node cache subgroup,
                # ``node_classification_dist.py:43-44``); rows hot only on
                # another host fall through to the base exchange.
                if hierarchical:
                    host_ax, data_ax = self.axis_name
                    H = mesh.shape[host_ax]
                    us, uo = build_union_tables(hot_ids, num_hosts=H)
                    sh_h = NamedSharding(mesh, P(host_ax, None))
                    self.union_sorted = jax.device_put(us, sh_h)
                    self.union_owner = jax.device_put(uo, sh_h)
                else:
                    us, uo = build_union_tables(hot_ids)
                    rep = NamedSharding(mesh, P())
                    self.union_sorted = jax.device_put(us, rep)
                    self.union_owner = jax.device_put(uo, rep)

    @property
    def feature_dim(self) -> int:
        return self.out_dim

    def request_budget_for(self, num_ids: int) -> int:
        """First-stage per-peer budget for a fetch of ``num_ids`` ids:
        per-chip for the flat exchange, per-HOST for the hierarchical one
        (coarser buckets — intra-host skew shares the host budget)."""
        if self.hierarchical:
            host_ax = self.axis_name[0]
            return request_budget(
                num_ids, self.mesh.shape[host_ax], self.budget_slack
            )
        return request_budget(num_ids, self.num_shards, self.budget_slack)

    def dequantize(self, rows: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
        """Undo int8 row packing after a fetch (no-op when not quantized)."""
        if not self.quantized:
            return rows
        from dist_gnn_tpu.ops.quantize import dequantize_unpack

        return dequantize_unpack(rows, out_dtype)

    def shard_args(self):
        """Array args to pass through shard_map, matched by shard_specs()."""
        if self.hot_sorted is None:
            return (self.features,)
        if self.union_sorted is not None:
            return (
                self.features, self.hot_sorted, self.hot_rows,
                self.union_sorted, self.union_owner,
            )
        return (self.features, self.hot_sorted, self.hot_rows)

    def shard_specs(self):
        ax = self.axis_name
        if self.hot_sorted is None:
            return (P(ax, None),)
        if self.union_sorted is not None:
            uspec = P(ax[0], None) if self.hierarchical else P(None)
            return (P(ax, None), P(ax, None), P(ax, None, None), uspec, uspec)
        return (P(ax, None), P(ax, None), P(ax, None, None))

    def _exchange(self, local_shard, ids, mask, budget):
        """Flat or hierarchical exchange depending on construction."""
        if self.hierarchical:
            host_ax, data_ax = self.axis_name
            return exchange_gather_hier(
                local_shard, ids, mask, host_ax, data_ax, self.shard_size,
                budget_host=budget, lossless=self.lossless,
            )
        return exchange_gather(
            local_shard, ids, mask, self.axis_name, self.shard_size,
            budget=budget, lossless=self.lossless,
        )

    def fetch_local(self, shard_args, ids, mask, budget=None):
        """Call inside shard_map over ``self.axis_name``.

        ``shard_args`` are the per-chip blocks of :meth:`shard_args`
        (hot tables arrive as [1, C]/[1, C, F] — squeezed here).
        """
        if self.hot_sorted is None:
            (local_shard,) = shard_args
            return self._exchange(local_shard, ids, mask, budget)
        if self.union_sorted is not None:
            local_shard, hot_sorted, hot_rows, union_sorted, union_owner = (
                shard_args
            )
        else:
            local_shard, hot_sorted, hot_rows = shard_args
            union_sorted = union_owner = None
        hot_sorted = hot_sorted.reshape(-1)
        hot_rows = hot_rows.reshape(hot_rows.shape[-2], hot_rows.shape[-1])
        if union_sorted is not None:
            # hierarchical: the per-host table arrives as a [1, U] block
            union_sorted = union_sorted.reshape(-1)
            union_owner = union_owner.reshape(-1)
        # hot probe: sorted binary search, local-HBM gather on hit
        pos = jnp.searchsorted(hot_sorted, ids)
        pos_c = jnp.clip(pos, 0, hot_sorted.shape[0] - 1)
        hit = mask & (hot_sorted[pos_c] == ids)
        hot_out = jnp.where(hit[:, None], hot_rows[pos_c], 0)
        miss_mask = mask & ~hit
        peer_out = None
        if union_sorted is not None:
            peer_out, peer_served = self._peer_hot_fetch(
                hot_sorted, hot_rows, union_sorted, union_owner,
                ids, miss_mask, budget,
            )
            miss_mask = miss_mask & ~peer_served
        # miss tier: all-to-all to the base shards
        cold_out, overflow = self._exchange(local_shard, ids, miss_mask, budget)
        if peer_out is not None:
            cold_out = jnp.where(peer_served[:, None], peer_out, cold_out)
        return jnp.where(hit[:, None], hot_out, cold_out), overflow

    def _peer_hot_fetch(
        self, hot_sorted, hot_rows, union_sorted, union_owner, ids, mask, budget
    ):
        if self.hierarchical:
            # peer-hot requests ride ONLY the intra-host data axis; the
            # caller's ``budget`` is the DCN host-stage budget and does not
            # apply here — size independently for the D-chip exchange
            ax = self.axis_name[1]
            Pb = request_budget(
                ids.shape[0], jax.lax.axis_size(ax), self.budget_slack
            )
        else:
            ax = self.axis_name
            Pb = (
                budget
                if budget is not None
                else request_budget(ids.shape[0], jax.lax.axis_size(ax))
            )
        return peer_hot_fetch(
            ax, hot_sorted, hot_rows, union_sorted, union_owner,
            ids, mask, Pb,
        )

    def hot_hit_rate(self, ids: np.ndarray, chip: int = 0) -> float:
        """Diagnostic: fraction of ids served by chip's hot tier."""
        if self.hot_sorted is None:
            return 0.0
        hs = np.asarray(self.hot_sorted)[chip]
        pos = np.clip(np.searchsorted(hs, ids), 0, len(hs) - 1)
        return float(np.mean(hs[pos] == ids))

    def fetch(self, ids: jnp.ndarray, mask: jnp.ndarray):
        """Standalone fetch (jit-able): ids/mask sharded or replicated
        per-chip [L]; returns per-chip rows.  Mostly for tests — training
        uses fetch_local inside the fused step."""
        L = ids.shape[0]
        budget = self.request_budget_for(L)

        def body(shard, ids_, mask_):
            rows, overflow = self._exchange(shard, ids_, mask_, budget)
            return rows, jax.lax.psum(overflow, self.axis_name)

        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(self.pspec, P(self.axis_name), P(self.axis_name)),
            out_specs=(P(self.axis_name), P()),
        )(self.features, ids, mask)
