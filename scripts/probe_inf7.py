"""Time the REAL _sum_all_edges engine call on the bench graph (per layer),
vs the probe_inf6 synthetic body (0.15 ms/chunk amortized).

Run: timeout 2400 python -u scripts/probe_inf7.py > /tmp/probe_inf7.log 2>&1
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.utils.platform import enable_compile_cache
    from dist_gnn_tpu.utils.timing import device_sync

    enable_compile_cache()
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models.inference import (
        _edge_rows, _pad_edges, _span_chunks, _sum_all_edges,
    )

    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
        train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    N, nnz = hg.num_nodes, int(hg.num_edges)
    EC, SPAN = 1 << 14, 512
    indptr = jnp.asarray(np.asarray(hg.indptr, np.int32))
    indices = jnp.asarray(hg.indices)
    erows = _edge_rows(indptr, N, nnz)
    indices_p = _pad_edges(indices, EC, 0)
    erows_p = _pad_edges(erows, EC, -1)
    eb, ec, rl = _span_chunks(np.asarray(hg.indptr), EC, SPAN)
    print(f"chunks={len(eb)} nnz={nnz}", flush=True)
    eb, ec, rl = jnp.asarray(eb), jnp.asarray(ec), jnp.asarray(rl)

    for F in (100, 256):
        h = jnp.asarray(
            np.random.default_rng(0).standard_normal((N, F)), jnp.bfloat16
        )
        for rep in range(3):
            t0 = time.time()
            out = _sum_all_edges(
                indices_p, erows_p, eb, ec, rl, h, None, EC, SPAN, N
            )
            device_sync(out)
            dt = time.time() - t0
        print(
            f"F={F}: {dt*1e3:.1f} ms  ({dt/len(np.asarray(eb))*1e6:.0f} us/chunk)"
            f"  {nnz/dt/1e6:.1f}M edges/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
