"""Cache routing table: node id → cache slot (or miss).

The reference routes every id through a GPU open-addressing CAS hashmap to
``(owner device, slot)`` (``src/hashmap/cuda/hashmap.h:13-90``,
``CreateNidsP2PCacheHashMapCUDA`` ``hashmap.cu:15-72``).  On TPU random
CAS probing is the wrong shape; a *sorted id array + vectorised binary
search* gives the same mapping with fully coalesced, jit-friendly lookups
(``jnp.searchsorted`` lowers to a parallel binary search).

For the partitioned ("selfless") cache the owner is recovered the same way
the reference does — each owner inserts its own slot range; on duplicate
ids the *local* copy wins (``hashmap.cu:37-72`` inserts remote ranks first
and the local rank last): here we resolve duplicates at build time with an
explicit priority argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def np_in_sorted(table: np.ndarray, ids) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side membership probe of a SORTED id array.

    Returns ``(member [bool], pos [intp])`` with ``pos`` clipped into the
    table (all-False / zeros when the table is empty).  The single source
    for the searchsorted+clip+equality idiom used by every host-side hot
    tier (host_tier, cache.autotune) — the device-side twin is
    :class:`SortedIdTable`.
    """
    ids = np.asarray(ids)
    if len(table) == 0:
        return np.zeros(len(ids), bool), np.zeros(len(ids), np.int64)
    pos = np.clip(np.searchsorted(table, ids), 0, len(table) - 1)
    return table[pos] == ids, pos


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedIdTable:
    """Maps id → slot for a cached id set.  ``slots[i]`` is the cache row of
    ``sorted_ids[i]``; lookups return (slot, hit)."""

    sorted_ids: jnp.ndarray  # [C] int32, strictly increasing
    slots: jnp.ndarray  # [C] int32 — cache row / payload per id
    owners: Optional[jnp.ndarray]  # [C] int32 — owning device (or None)

    @staticmethod
    def build(
        cache_nids: np.ndarray,
        slots: Optional[np.ndarray] = None,
        owners: Optional[np.ndarray] = None,
        priority: Optional[np.ndarray] = None,
    ) -> "SortedIdTable":
        """Host-side build.  ``slots`` defaults to the position in
        ``cache_nids``.  On duplicate ids the entry with the *lowest*
        ``priority`` value wins (pass priority=0 for local, 1 for remote to
        reproduce the reference's local-copy-wins rule)."""
        cache_nids = np.asarray(cache_nids, dtype=np.int32)
        n = len(cache_nids)
        if slots is None:
            slots = np.arange(n, dtype=np.int32)
        if priority is None:
            priority = np.zeros(n, dtype=np.int32)
        order = np.lexsort((priority, cache_nids))
        ids_s = cache_nids[order]
        keep = np.ones(n, dtype=bool)
        keep[1:] = ids_s[1:] != ids_s[:-1]  # first (lowest priority) wins
        order = order[keep]
        ids_final = cache_nids[order]
        return SortedIdTable(
            sorted_ids=jnp.asarray(ids_final),
            slots=jnp.asarray(np.asarray(slots, np.int32)[order]),
            owners=(
                jnp.asarray(np.asarray(owners, np.int32)[order])
                if owners is not None
                else None
            ),
        )

    @property
    def sorted_ids_np(self) -> np.ndarray:
        return np.asarray(self.sorted_ids)

    def lookup(self, nids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(slot, hit) per query id; misses return slot 0 with hit=False."""
        pos = jnp.searchsorted(self.sorted_ids, nids)
        pos_c = jnp.clip(pos, 0, self.sorted_ids.shape[0] - 1)
        hit = (self.sorted_ids.shape[0] > 0) & (self.sorted_ids[pos_c] == nids)
        return jnp.where(hit, self.slots[pos_c], 0), hit

