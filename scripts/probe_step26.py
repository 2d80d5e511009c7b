import sys
sys.path.insert(0, "/root/repo")
from dist_gnn_tpu.utils.platform import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
from dist_gnn_tpu.dataloading import SeedGenerator
from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
from dist_gnn_tpu.graph import HostGraph
from dist_gnn_tpu.models import SAGE
from dist_gnn_tpu.cache.autotune import tune_sampler_for
from dist_gnn_tpu.sampler import sample_blocks
from dist_gnn_tpu.training import Trainer
from dist_gnn_tpu.utils.timing import measure_op

FAN_OUT = (15, 10, 5); N = 500_000
print("device:", jax.devices()[0], flush=True)
arrays, meta = make_synthetic_dataset(num_nodes=N, avg_degree=30,
    feature_dim=100, num_classes=47, train_frac=0.2, seed=0)
hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
cfg = tune_sampler_for(hg, arrays["train_idx"], 512, FAN_OUT)
print("tuned:", cfg, flush=True)
graph = hg.to_device(with_indptr_pairs=True, window_pair=cfg.window[0])
features = jnp.asarray(arrays["features"]).astype(jnp.bfloat16)
labels = jnp.asarray(arrays["labels"])
gen = SeedGenerator(arrays["train_idx"], 512, shuffle=True, drop_last=True)
it2 = gen.epoch(jax.random.key(101))
b4 = [next(it2) for _ in range(4)]
sU = jnp.stack([b[0] for b in b4]); mU = jnp.stack([b[1] for b in b4])
jax.block_until_ready((sU, mU))
model = SAGE(100, 256, meta["num_classes"], 3, compute_dtype=jnp.bfloat16)

configs = {
  "hand  (128,1024)/(5120,1024)/26624": dict(
      frontier_caps=(3072, 26624, 10**9), sampler_window=(128, 1024),
      sampler_big_budget=(5120, 1024)),
  "tuned": cfg.trainer_kwargs(),
}
for name, kw in configs.items():
    tr = Trainer(model=model, fan_out=FAN_OUT, dedup_last=False, **kw)
    st = tr.init_state(jax.random.key(0))
    def fullU(s_, graph, features, tr=tr):
        s2, _ = tr.train_step_multi.__wrapped__(
            tr, s_, graph, features, labels, sU, mU, jax.random.key(7))
        return s2
    dt = measure_op(fullU, st, iters=4, args=(graph, features))
    # edges per step under this config
    blocks, stats = sample_blocks(graph, b4[0][0], b4[0][1], FAN_OUT, False,
        jax.random.key(7), dedup_last=False,
        window=kw["sampler_window"], big_row_budget=kw["sampler_big_budget"],
        frontier_caps=kw["frontier_caps"])
    e = int(sum(int(jnp.sum(b.neigh_mask)) for b in blocks))
    ovf = int(stats["sampler_overflow"]) + int(stats["frontier_overflow"])
    print(f"{name:40s} {dt/4*1e3:7.3f} ms/step  {e/(dt/4)/1e6:6.1f} M edges/s"
          f"  edges {e} ovf {ovf}", flush=True)
