"""Round-5 probe: single-pass online-softmax GAT serving engine
(models/inference._gat_online_all_edges) vs the round-4 two-pass numbers
(35.1M e/s in BENCH_r04), plus span/edge_chunk sensitivity for both GAT
and SAGE under the rebuilt walk.  Run on the real TPU chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dist_gnn_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import GAT, SAGE
from dist_gnn_tpu.models.inference import _PREP_CACHE, full_graph_inference
from dist_gnn_tpu.utils.timing import device_sync

arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
nnz = int(meta["num_edges"])
L = 3

sage = SAGE(features.shape[1], 256, meta["num_classes"], L, compute_dtype=jnp.bfloat16)
sp = sage.init(jax.random.key(0))
gat = GAT(features.shape[1], 128, meta["num_classes"], L, num_heads=4,
          compute_dtype=jnp.bfloat16)
gp = gat.init(jax.random.key(1))

for span, ec in [(512, 1 << 14), (256, 1 << 13), (384, 1 << 14), (256, 1 << 14), (128, 1 << 12)]:
    _PREP_CACHE.clear()
    for name, model, params in [("sage", sage, sp), ("gat", gat, gp)]:
        dts = []
        for rep in range(3):
            t0 = time.time()
            out = full_graph_inference(
                model, params, hg, features, node_chunk=span, edge_chunk=ec
            )
            device_sync(out)
            dts.append(time.time() - t0)
        dt = min(dts[1:])  # steady state
        print(
            f"span={span} ec={ec} {name}: {L * nnz / dt / 1e6:.1f}M e/s "
            f"(dt {dt:.3f}s; first {dts[0]:.2f})",
            flush=True,
        )
