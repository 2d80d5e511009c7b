"""Feature stores: where node features live and how rows are fetched.

TPU redesign of ``P2PCacheFeatureServer`` (``src/feature/feature_sever.h:
10-33``, ``src/feature/cuda/feature_ops.cu:38-73``): there is no cross-chip
pointer deref on TPU, so the per-element "local HBM | peer HBM | pinned
host" resolution becomes one of

  * :class:`HBMFeatureStore` — the whole feature matrix in device HBM
    (single chip or replicated across a mesh); a fetch is a plain gather.
  * :class:`CachedFeatureStore` — hot rows (heat/value policy) resident in
    HBM, cold rows in a backing numpy array prefetched host-side; routing
    via a sorted-id table + searchsorted (the hashmap analog,
    ``src/hashmap/cuda/hashmap.h:34-48`` → ops/hashtable).
  * sharded mesh store with all-to-all exchange — parallel/feature_store.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.graph import INVALID_ID
from dist_gnn_tpu.ops.hashtable import SortedIdTable


class HBMFeatureStore:
    """Full feature matrix in HBM; ``get_features`` = masked gather.

    Counterpart of the no-cache UVA path ``GetFeaturesCUDA``
    (``feature_ops.cu:140-210``) but at HBM bandwidth instead of PCIe.
    """

    def __init__(self, features: jnp.ndarray):
        self.features = features

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    def get_features(self, nids: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        if mask is None:
            mask = nids != INVALID_ID
        safe = jnp.where(mask, nids, 0)
        rows = self.features[safe]
        return jnp.where(mask[:, None], rows, 0)


class CachedFeatureStore:
    """Hot rows in HBM + host-resident cold tier.

    The fetch is split by a routing-table probe (hit → HBM gather, miss →
    host gather staged through a device upload).  ``cache_nids`` come from
    the heat/value policy (cache/policy.py), mirroring the reference ctor
    (``feature_server.cc:10-61``).

    NOTE: the miss path crosses to the host per batch; production multi-chip
    setups should prefer the sharded mesh store, which keeps everything in
    aggregate HBM.
    """

    def __init__(self, host_features: np.ndarray, cache_nids: np.ndarray):
        # sort + dedup so slot i of the hot matrix is sorted_ids[i];
        # filter INVALID_ID padding and out-of-range ids first — cache
        # plans arrive as [C] INVALID-padded rows (cache/builder.py), and
        # an unfiltered pad id indexed host_features out of bounds (the
        # sibling stores HostCSCStore / DistHost* all filter the same way)
        ids = np.asarray(cache_nids, dtype=np.int64)
        ids = ids[(ids >= 0) & (ids < host_features.shape[0])]
        cache_sorted = np.unique(ids.astype(np.int32))
        self.table = SortedIdTable.build(cache_sorted)
        self.hot = jnp.asarray(host_features[cache_sorted])
        self.host_features = host_features

    @property
    def feature_dim(self) -> int:
        return self.host_features.shape[1]

    def hit_rate(self, nids: np.ndarray) -> float:
        slots, hit = self.table.lookup(jnp.asarray(nids))
        return float(jnp.mean(hit.astype(jnp.float32)))

    def get_features(self, nids: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        if mask is None:
            mask = nids != INVALID_ID
        slots, hit = self.table.lookup(nids)
        hit = hit & mask
        hot_rows = jnp.where(
            hit[:, None], self.hot[jnp.where(hit, slots, 0)], 0
        )
        # miss tier: host gather (numpy) + upload. Host sync per batch.
        miss = np.asarray(mask & ~hit)
        nids_np = np.asarray(nids)
        miss_idx = np.flatnonzero(miss)
        out = hot_rows
        if miss_idx.size:
            rows = self.host_features[nids_np[miss_idx]]
            out = out.at[jnp.asarray(miss_idx)].set(jnp.asarray(rows))
        return out
