"""Serving metric probe: full-graph inference wall time on the bench graph
(SAGE + GAT + GCN), round-4 span-chunk engine.

Run: timeout 2400 python -u scripts/probe_inf5.py > /tmp/probe_inf5.log 2>&1
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
    from dist_gnn_tpu.models import GAT, GCN, SAGE
    from dist_gnn_tpu.models.inference import full_graph_inference

    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
        train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    E3 = 3 * int(meta["num_edges"])

    sage = SAGE(100, 256, 47, 3, compute_dtype=jnp.bfloat16)
    gcn = GCN(100, 256, 47, 3, compute_dtype=jnp.bfloat16)
    gat = GAT(100, 128, 47, 3, num_heads=4, compute_dtype=jnp.bfloat16)
    for name, model in (("sage", sage), ("gcn", gcn), ("gat", gat)):
        params = model.init(jax.random.key(0))
        for rep in range(2):
            t0 = time.time()
            logits = full_graph_inference(model, params, hg, features)
            device_sync(logits)
            dt = time.time() - t0
        print(
            f"{name}: {dt:.3f} s  -> {E3/dt/1e6:.1f}M edges/s  "
            f"logits[0,:3]={np.asarray(logits[0,:3], np.float32)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
