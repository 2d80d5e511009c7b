"""GAT full-graph serving: span/edge-chunk sensitivity (round-4).

Run: timeout 2400 python -u scripts/probe_inf9.py > /tmp/probe_inf9.log 2>&1
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
    from dist_gnn_tpu.models import GAT
    from dist_gnn_tpu.models.inference import full_graph_inference

    arrays, meta = make_synthetic_dataset(
        num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
        train_frac=0.2, seed=0,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
    E3 = 3 * int(meta["num_edges"])
    gat = GAT(100, 128, 47, 3, num_heads=4, compute_dtype=jnp.bfloat16)
    params = gat.init(jax.random.key(0))
    for span, ec in ((512, 1 << 14), (1024, 1 << 15), (2048, 1 << 15)):
        for rep in range(2):
            t0 = time.time()
            logits = full_graph_inference(
                gat, params, hg, features, node_chunk=span, edge_chunk=ec
            )
            device_sync(logits)
            dt = time.time() - t0
        print(
            f"span={span} ec={ec}: {dt:.2f} s -> {E3/dt/1e6:.1f}M e/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
