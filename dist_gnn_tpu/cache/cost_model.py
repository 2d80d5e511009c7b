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
    # measured components of the host STAGING path (calibrate_host_staging);
    # informational — bandwidth_host is the effective serial rate of the two
    staging_gather_bandwidth: float = 0.0  # bytes/s, host-RAM row gather
    staging_h2d_bandwidth: float = 0.0  # bytes/s, host→device ship
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
        (``cache_value.py:363``).  Floored at the ICI bandwidth: the
        linear peer-contention model goes NEGATIVE past
        ``1 + bandwidth_hbm/bandwidth_ici`` devices (~19 at defaults),
        which would invert the selfless score in the auto policy — at
        that device count local reads are ICI-arbitration-bound, not
        HBM-bound."""
        return max(
            self.bandwidth_hbm - (num_devices - 1) * self.bandwidth_ici,
            self.bandwidth_ici,
        )


def available_hbm_bytes(device=None, reserved: int = 2 << 30) -> int:
    """Free HBM on ``device`` minus a safety headroom.

    The cache-capacity input, replacing ``get_available_memory``
    (``python/DistGNN/cache/cache_value.py:412-417``,
    ``CUDAContext::GetCurrAllocated`` ``src/common/cuda_context.h:15``).
    Falls back to a conservative constant when the backend exposes no
    memory stats.
    """
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        used = stats.get("bytes_in_use", 0)
        if limit:
            return max(int(limit) - int(used) - reserved, 0)
    except Exception:
        pass
    return 8 << 30  # conservative default


def calibrate_ici(mesh=None, axis_name: str = "data", mbytes: int = 8) -> float:
    """Measure per-hop all-to-all bandwidth over the mesh (bytes/s/link).

    TPU replacement for the NVLink probe in ``scripts/bandwidth.py``; used
    to refresh ``CostModel.bandwidth_ici`` for the selfless policy scoring.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from dist_gnn_tpu.parallel.mesh import make_mesh
    from dist_gnn_tpu.utils.timing import measure_chain

    mesh = mesh or make_mesh()
    n = mesh.shape[axis_name]
    if n < 2:
        return CostModel.bandwidth_ici
    rows = mbytes * (1 << 20) // 512 // n * n
    x = jnp.zeros((rows, 128), jnp.float32)

    def body(blk):
        return jax.lax.all_to_all(blk, axis_name, 0, 0, tiled=True) + 1.0

    step = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P(axis_name, None), out_specs=P(axis_name, None)
        )
    )
    dt = measure_chain(step, x, n_lo=3, n_hi=12)
    total_bytes = rows * 128 * 4
    return total_bytes * (n - 1) / n / dt


def calibrate_host_staging(
    feature_dim: int = 128,
    base_rows: int = 1 << 18,
    batch_rows: int = 1 << 14,
    reps: int = 5,
    cm: "CostModel | None" = None,
) -> CostModel:
    """Measure the host STAGING tier: host-RAM row gather + async H2D
    ship — the TPU analog of the reference's measured 8.32 GB/s UVA/PCIe
    constant (``node_classification.py:80``, probed by
    ``scripts/bandwidth.py``), which round-2 left unmeasured (VERDICT #7).

    The H2D leg uses SIZE-SLOPE timing (difference of two transfer sizes
    cancels the fixed dispatch overhead) with completion forced by a
    scalar readback — block_until_ready does not await on tunneled
    backends (NOTES #1).  Sets ``cm.bandwidth_host`` to the effective
    serial rate of the two legs (the score_* knapsack inputs then reflect
    the REAL three-tier costs) and records each leg separately.
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dist_gnn_tpu.utils import native

    cm = cm or CostModel()
    rng = np.random.default_rng(0)
    base = rng.standard_normal((base_rows, feature_dim)).astype(np.float32)
    ids = rng.integers(0, base_rows, batch_rows).astype(np.int32)
    out = np.empty((batch_rows, feature_dim), np.float32)

    native.gather_rows(base, ids, out=out)  # warm
    t0 = _time.perf_counter()
    for _ in range(reps):
        native.gather_rows(base, ids, out=out)
    gather_dt = (_time.perf_counter() - t0) / reps

    def h2d_time(r):
        buf = np.ascontiguousarray(out[:r])
        x = jax.device_put(buf)
        float(jnp.sum(x[0]))  # warm (compile the forcing reduction)
        ts = []
        for _ in range(reps):
            t1 = _time.perf_counter()
            x = jax.device_put(buf)
            float(jnp.sum(x[0]))  # readback forces transfer completion
            ts.append(_time.perf_counter() - t1)
        return min(ts)

    r1, r2 = max(batch_rows // 4, 1), batch_rows
    slope_dt = max(h2d_time(r2) - h2d_time(r1), 1e-9)
    h2d_bw = (r2 - r1) * feature_dim * 4 / slope_dt
    bytes_total = batch_rows * feature_dim * 4
    gather_bw = bytes_total / max(gather_dt, 1e-9)
    cm.staging_gather_bandwidth = gather_bw
    cm.staging_h2d_bandwidth = h2d_bw
    # the two legs serialize on the host thread per batch
    cm.bandwidth_host = 1.0 / (1.0 / gather_bw + 1.0 / h2d_bw)
    return cm


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
