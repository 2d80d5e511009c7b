"""Graph containers (CSC layout, in-neighbors).

The reference keeps the graph as two CPU torch tensors ``indptr``/``indices``
(CSC of the directed graph, i.e. for each node its *in*-neighbors —
``/root/reference/python/DistGNN/dataloading/dataset_preprocess.py:37-45``)
plus optional per-edge sampling probabilities ``probs``.

Here the host-side container is numpy (:class:`HostGraph`) and the
device-side container is a pytree of jnp arrays (:class:`Graph`) with static
metadata (num_nodes / num_edges / max_degree) hashable for jit.

Design notes (TPU-first):
  * ``indices`` is int32 (node ids < 2**31 for every OGB graph incl.
    papers100M at 111M nodes); ``indptr`` is int64 when nnz >= 2**31.
  * ``max_degree`` is static metadata: chunked edge walks (bias sampling,
    heat) derive their static trip counts from it.
  * ``edge_rows`` (the row id of every edge, i.e. CSR "expand indptr") is
    materialised lazily — segment ops over edges need it and XLA has no
    dynamic ``repeat``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Padding sentinel for node ids. Must sort *after* every valid id so the
# sort-based unique/relabel compaction can push padding to the tail.
INVALID_ID = np.iinfo(np.int32).max


def _min_indptr_dtype(num_edges: int):
    return np.int32 if num_edges < 2**31 else np.int64


@dataclasses.dataclass(frozen=True)
class HostGraph:
    """CSC graph resident in host memory (numpy).

    The analog of the reference's pinned CPU tensors
    (``src/common/pin_memory.cc:7-12``); on TPU the host copy only feeds
    device uploads / preprocessing — there is no UVA zero-copy path.
    """

    indptr: np.ndarray  # [N+1]
    indices: np.ndarray  # [nnz] int32
    probs: Optional[np.ndarray] = None  # [nnz] float32, unnormalised weights

    def __post_init__(self):
        assert self.indptr.ndim == 1 and self.indices.ndim == 1
        if self.probs is not None:
            assert self.probs.shape == self.indices.shape

    @property
    def num_nodes(self) -> int:
        return int(self.indptr.shape[0] - 1)

    @property
    def num_edges(self) -> int:
        return int(self.indices.shape[0])

    @property
    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    @property
    def max_degree(self) -> int:
        if self.num_nodes == 0:
            return 0
        return int(self.degrees.max())

    @staticmethod
    def from_coo(
        src: np.ndarray,
        dst: np.ndarray,
        num_nodes: int,
        probs: Optional[np.ndarray] = None,
        symmetrize: bool = False,
    ) -> "HostGraph":
        """Build the CSC (in-neighbor) graph from a directed edge list.

        Mirrors the reference preprocessing: rows are *destinations*, the
        stored neighbor list of a node is its in-neighbors
        (``dataset_preprocess.py:37-45``).  ``symmetrize=True`` adds reverse
        edges first (ogbn-products path).  Uses the native C++ builder when
        available, else numpy counting sort.
        """
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if probs is not None:
                probs = np.concatenate([probs, probs])
        src = np.asarray(src)
        dst = np.asarray(dst)

        from dist_gnn_tpu.utils import native

        built = native.build_csc(dst, src, num_nodes, probs)
        if built is not None:
            indptr, indices, out_probs = built
            return HostGraph(indptr=indptr, indices=indices, probs=out_probs)

        # numpy fallback: counting sort by destination.
        counts = np.bincount(dst, minlength=num_nodes)
        indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        order = np.argsort(dst, kind="stable")
        indices = src[order].astype(np.int32)
        out_probs = probs[order].astype(np.float32) if probs is not None else None
        indptr = indptr.astype(_min_indptr_dtype(len(indices)))
        return HostGraph(indptr=indptr, indices=indices, probs=out_probs)

    def build_alias_tables(self):
        """Walker alias tables for O(1) weighted draws (requires probs).

        Host-side, native C++ when built (see csrc/graph_build.cc
        dg_build_alias); the device sampler ``sample_biased_alias`` consumes
        them.  Returns (prob [nnz] f32, alias [nnz] int32 row offsets).
        """
        assert self.probs is not None
        from dist_gnn_tpu.utils import native

        return native.build_alias(self.indptr, self.probs)

    def to_device(
        self,
        sharding=None,
        with_alias: bool = False,
        with_indptr_pairs: bool = False,
        window_pair: int = 0,
    ) -> "Graph":
        put = lambda x: jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)

        # Pad edge-aligned arrays to a multiple of 4096 ONCE so the windowed
        # fetch (ops/sampling._window_select_raw) can reshape to any W<=2048
        # row width without materialising a fresh padded copy of the whole
        # edge array per call (60 MB per window level at papers-scale).
        # indices pads with num_nodes (the same OOB sentinel the heat sweep
        # uses for its own tail padding); padded slots are never *selected*
        # by the window hitmask, only fetched.
        _PADM = 4096
        pad_n = (-self.num_edges) % _PADM

        def pad_edges(arr, value):
            if pad_n == 0:
                return arr
            return np.concatenate(
                [arr, np.full((pad_n,), value, arr.dtype)]
            )

        alias_prob = alias_idx = alias_pack = None
        if with_alias and self.probs is not None:
            ap, ai = self.build_alias_tables()
            alias_prob = put(pad_edges(ap, 0))
            alias_idx = put(pad_edges(ai, 0))
            # packed (prob-bits, idx) pairs: the biased samplers' per-draw
            # (prob, alias) lookup becomes ONE 2-wide row gather instead of
            # two elementwise gathers (gather cost is per-slice on TPU —
            # NOTES.md §6) — ~2x on the alias hot path
            pack = np.empty((ap.shape[0], 2), np.int32)
            pack[:, 0] = ap.astype(np.float32).view(np.int32)
            pack[:, 1] = ai.astype(np.int32)
            if pad_n:
                pack = np.concatenate(
                    [pack, np.zeros((pad_n, 2), np.int32)]
                )
            alias_pack = put(pack)
        indptr_pairs = None
        if with_indptr_pairs:
            # [N, 2] (start, end) rows: one row gather per seed replaces two
            # elementwise indptr gathers in the samplers (~2x extent cost at
            # large frontiers — see ops/sampling._row_extents).  Opt-in:
            # costs 8 B/node of extra HBM.
            indptr_pairs = put(
                np.stack([self.indptr[:-1], self.indptr[1:]], axis=1)
            )
        def build_pair(W: int, flats):
            # pair layout at window W: concat of the two 2W-aligned
            # reshapes — any W-granular 2W-window is one row
            # (ops/sampling._window_select_multi).  With several flats the
            # per-array windows are concatenated ALONG THE ROW, so one row
            # gather fetches all of them (ids+probs for the biased Gumbel
            # level).  Costs nnz*4B extra HBM per flat.
            n1 = -(-self.num_edges // W)
            ra = n1 // 2
            rows_b = (n1 - 1) // 2
            parts_a, parts_b = [], []
            for flat in flats:
                padded = np.zeros(n1 * W, np.int32)
                padded[: self.num_edges] = flat
                parts_a.append(padded[: ra * 2 * W].reshape(ra, 2 * W))
                parts_b.append(
                    padded[W : W + rows_b * 2 * W].reshape(rows_b, 2 * W)
                )
            cat = lambda ps: ps[0] if len(ps) == 1 else np.concatenate(ps, 1)
            return put(np.concatenate([cat(parts_a), cat(parts_b)], 0)), ra

        win_pair = win_pair2 = None
        rows_a = rows_a2 = 0
        w1 = w2 = 0
        pair_width = 1
        if window_pair:
            # int -> one level-1 layout; (W1, W2) -> a second layout for
            # the hub-cascade level too (halves its fetched row count).
            # With probs, ids+probs share one combined layout: the biased
            # Gumbel level's window fetch becomes ONE row gather (ids-only
            # consumers slice columns [:2W] — a fused slice, not a copy).
            if isinstance(window_pair, (tuple, list)):
                w1, w2 = int(window_pair[0]), int(window_pair[1])
            else:
                w1 = int(window_pair)
            flats = [self.indices.astype(np.int32)]
            if self.probs is not None:
                flats.append(self.probs.astype(np.float32).view(np.int32))
                pair_width = 2
            win_pair, rows_a = build_pair(w1, flats)
            if w2:
                win_pair2, rows_a2 = build_pair(w2, flats)
        return Graph(
            indptr=put(self.indptr),
            indices=put(pad_edges(self.indices.astype(np.int32), self.num_nodes)),
            probs=put(pad_edges(self.probs.astype(np.float32), 0))
            if self.probs is not None
            else None,
            num_nodes=self.num_nodes,
            num_edges=self.num_edges,
            max_degree=self.max_degree,
            alias_prob=alias_prob,
            alias_idx=alias_idx,
            alias_pack=alias_pack,
            indptr_pairs=indptr_pairs,
            win_pair=win_pair,
            win_pair_w=w1,
            win_pair_rows_a=rows_a,
            win_pair2=win_pair2,
            win_pair2_w=w2,
            win_pair2_rows_a=rows_a2,
            win_pair_width=pair_width,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """Device-resident CSC graph: a jit-friendly pytree with static metadata."""

    indptr: jnp.ndarray
    indices: jnp.ndarray
    probs: Optional[jnp.ndarray]
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    max_degree: int = dataclasses.field(metadata=dict(static=True))
    # Walker alias tables for O(1) weighted draws (optional, see
    # HostGraph.build_alias_tables)
    alias_prob: Optional[jnp.ndarray] = None
    alias_idx: Optional[jnp.ndarray] = None
    # [N, 2] (start, end) rows for one-row-gather extents (optional, see
    # HostGraph.to_device(with_indptr_pairs=True))
    indptr_pairs: Optional[jnp.ndarray] = None
    # Pair layout of ``indices`` for the level-1 windowed edge fetch: the
    # two 2W-aligned reshapes concatenated, so any 2W-window starting at a
    # multiple of W is ONE row — halving the gathered row count vs the
    # two-row fetch (0.48 -> 0.27 ms at the bench hop-3 shape).  Costs a
    # second copy of ``indices`` in HBM; see to_device(window_pair=W).
    win_pair: Optional[jnp.ndarray] = None
    win_pair_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    # rows in the first (offset-0) view of win_pair
    win_pair_rows_a: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # optional second pair layout at the hub-cascade window W2
    win_pair2: Optional[jnp.ndarray] = None
    win_pair2_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    win_pair2_rows_a: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # arrays interleaved along the pair row: 1 = ids only ([*, 2W] rows),
    # 2 = ids|probs-bits combined ([*, 4W] rows — biased graphs)
    win_pair_width: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )
    # packed [(padded) nnz, 2] int32 (alias-prob bits, alias idx) — one
    # row gather per alias draw instead of two elementwise gathers
    alias_pack: Optional[jnp.ndarray] = None

    @property
    def has_probs(self) -> bool:
        return self.probs is not None

    def degrees_of(self, nids: jnp.ndarray) -> jnp.ndarray:
        """Degrees of (possibly padded) node ids; padding slots get 0."""
        safe = jnp.clip(nids, 0, self.num_nodes - 1)
        deg = (self.indptr[safe + 1] - self.indptr[safe]).astype(jnp.int32)
        return jnp.where(nids == INVALID_ID, 0, deg)

    def edge_rows(self) -> jnp.ndarray:
        """Row (destination) id of every edge: CSR-expand of indptr.

        ``searchsorted(indptr, e, 'right') - 1`` — static shape [nnz],
        replaces the reference's per-thread row loops in the heat kernels
        (``src/cache/cuda/preprocess_heat.cu:22-32``).
        """
        e = jnp.arange(self.num_edges, dtype=self.indptr.dtype)
        return (jnp.searchsorted(self.indptr, e, side="right") - 1).astype(jnp.int32)
