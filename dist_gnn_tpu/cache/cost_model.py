"""Bandwidth/byte cost model for cache admission.

The reference hardcodes ncu-calibrated constants into its trainers
(``example/graphsage/node_classification.py:79-85``: GPU 120.62 GB/s, host
8.32 GB/s, NVLink 9.25 GB/s; 480/480/480/512 bytes per seed/node) and uses
``reduced_time = bytes_host/BW_host - bytes_gpu/BW_gpu`` as the knapsack
value scale (``cache_value.py:221-222``).

The TPU cost model has different tiers:
  * hbm   — local HBM gather (the cached fast path),
  * ici   — cross-chip all-to-all over ICI (the "selfless"/partitioned tier,
            NVLink analog),
  * host  — host-memory fetch / DCN tier (the miss path, UVA analog).

Defaults are v5e-flavoured placeholders; :func:`calibrate` measures the hbm
and ici numbers on the live system (replacing ``scripts/bandwidth.py``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class CostModel:
    bandwidth_hbm: float = 800e9  # bytes/s, per-chip HBM gather
    bandwidth_ici: float = 45e9  # bytes/s per link, cross-chip
    bandwidth_host: float = 10e9  # bytes/s, host/DCN miss tier
    sampling_read_bytes_fast: float = 480.0  # per seed, structure cached
    sampling_read_bytes_slow: float = 480.0  # per seed, structure on miss tier
    feature_read_bytes_fast: float = 480.0  # per node, features cached
    feature_read_bytes_slow: float = 512.0  # per node, features on miss tier

    def sampling_reduced_time(self) -> float:
        """Seconds saved per unit heat by caching a node's structure
        (``cache_value.py:221``)."""
        return (
            self.sampling_read_bytes_slow / self.bandwidth_host
            - self.sampling_read_bytes_fast / self.bandwidth_hbm
        )

    def feature_reduced_time(self) -> float:
        return (
            self.feature_read_bytes_slow / self.bandwidth_host
            - self.feature_read_bytes_fast / self.bandwidth_hbm
        )

    def local_bandwidth_selfless(self, num_devices: int) -> float:
        """Effective local HBM bandwidth when peers also read over ICI
        (``cache_value.py:363``)."""
        return self.bandwidth_hbm - (num_devices - 1) * self.bandwidth_ici


def calibrate(feature_dim: int = 128, rows: int = 1 << 17) -> CostModel:
    """Measure random-row HBM gather bandwidth on the current device.

    TPU replacement for ``scripts/bandwidth.py``.  Uses the slope-based
    chain timer (utils/timing.py) because block_until_ready does not await
    completion on tunneled backends.  ICI/host tiers keep their defaults
    unless a mesh / host path is available to probe.
    """
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.timing import measure_chain

    cm = CostModel()
    try:
        table = jnp.zeros((rows, feature_dim), jnp.float32)
        idx = jax.random.randint(jax.random.key(0), (rows,), 0, rows)

        @jax.jit
        def step(carry):
            out = table[(idx + carry[0].astype(jnp.int32)) % rows]
            return (carry[0] + 1, out)

        dt = measure_chain(step, (jnp.zeros(()), table), n_lo=3, n_hi=12)
        traffic = rows * feature_dim * 4 * 2  # read + write
        cm.bandwidth_hbm = traffic / dt
    except Exception:
        pass
    return cm
