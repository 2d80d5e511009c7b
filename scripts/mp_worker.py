"""Multi-process cluster worker: full DistTrainer e2e on a (2, 4) mesh.

One rank of a REAL 2-OS-process JAX cluster (gloo collectives over
localhost) — the CPU analog of one torchrun rank in the reference's
multi-node path (``example/graphsage/node_classification_dist.py``).
Driven by tests/test_multiprocess.py, which compares the per-step losses
against the identical single-process (2, 4)-mesh run.

Usage:
  python scripts/mp_worker.py OUT_JSON PORT NUM_PROCESSES PROCESS_ID \
      [TIER] [MESH_HOSTS]
  python scripts/mp_worker.py OUT_JSON 0 0 0        # single-process mode

MESH_HOSTS (default 2) sets the host-axis size of the ('host', 'data')
mesh over the 8 global devices — 2 gives the (2, 4) mesh, 4 the (4, 2)
one (round-4 VERDICT #5: ≥4 OS ranks).  The single-process reference for
a cluster run must pass the same MESH_HOSTS so the collective layouts
match.

TIER selects the data plane: "hbm" (default — all-HBM DistTrainer) or
"dist-host" (the flagship composition: host-RAM-resident features AND
structure staged per batch over the 2-tier mesh — DistHostTrainer, the
analog of the reference's pinned-host deployment,
``node_classification_dist.py:305-306`` + ``pin_memory.cc:7-12``).

Every process runs the same deterministic host-side data construction
(seeded numpy), so global device_puts are valid (same value everywhere).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 6
BATCH = 16 * 8  # global batch over the 8-device mesh


def main() -> None:
    out_path = sys.argv[1]
    port, num_procs, pid = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    tier = sys.argv[5] if len(sys.argv) > 5 else "hbm"
    mesh_hosts = int(sys.argv[6]) if len(sys.argv) > 6 else 2

    from dist_gnn_tpu.parallel.mesh import (
        initialize_cpu_cluster,
        replicate_to_mesh,
    )
    from dist_gnn_tpu.utils.platform import enable_compile_cache, force_cpu

    if num_procs > 0:
        initialize_cpu_cluster(
            f"localhost:{port}", num_procs, pid, devices_per_process=8 // num_procs
        )
    else:
        force_cpu(8)
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import SAGE
    from dist_gnn_tpu.parallel import DistTrainer, ShardedFeatureStore, make_mesh
    from dist_gnn_tpu.parallel.graph_dist import ShardedGraph

    mesh = make_mesh(axis_names=("host", "data"), hosts=mesh_hosts)
    ax = ("host", "data")

    # identical deterministic dataset on every process
    arrays, meta = make_synthetic_dataset(
        num_nodes=1200, avg_degree=8, feature_dim=16, num_classes=4,
        train_frac=0.4, seed=13,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])
    model = SAGE(meta["feature_dim"], 16, meta["num_classes"], 2, dropout=0.0)
    # typed PRNG keys can't be device_put to a global sharding directly:
    # replicate the raw key data, then re-wrap
    key = jax.random.wrap_key_data(
        jax.device_put(
            np.asarray(jax.random.key_data(jax.random.key(6))),
            NamedSharding(mesh, P()),
        )
    )
    seed_sh = NamedSharding(mesh, P(ax))
    train = arrays["train_idx"]
    losses, accs = [], []

    if tier == "dist-host":
        # flagship composition: host-RAM features + structure, per-chip
        # HBM hot tiers (deterministic plan — identical on every rank),
        # intra-host peer-hot, per-batch staging, all on the 2-tier mesh
        from dist_gnn_tpu.parallel.host_dist import (
            DistHostFeatureStore,
            DistHostTrainer,
        )
        from dist_gnn_tpu.parallel.host_struct import DistHostCSCStore

        prng = np.random.default_rng(77)
        n = 8
        s_hot = prng.permutation(1200)[: n * 60].reshape(n, 60).astype(np.int32)
        f_hot = prng.permutation(1200)[: n * 80].reshape(n, 80).astype(np.int32)
        gstore = DistHostCSCStore(
            hg, mesh, s_hot, miss_budget=2048, deg_cap=24, axis_name=ax
        )
        fstore = DistHostFeatureStore(
            arrays["features"], mesh, f_hot, miss_budget=4096, axis_name=ax
        )
        trainer = DistHostTrainer(
            model=model, fan_out=(4, 4), store=fstore, gstore=gstore,
            dedup_last=False,
        )
        state = replicate_to_mesh(
            jax.tree.map(np.asarray, trainer.init_state(jax.random.key(0))),
            mesh,
        )
        batches = []
        for step in range(STEPS):
            sel = np.random.default_rng(step).choice(
                len(train), BATCH, replace=False
            )
            batches.append((train[sel].astype(np.int32), np.ones(BATCH, bool)))
        state, metrics = trainer.train_batches(
            state, None, arrays["labels"], batches, key
        )
        losses = [float(m["loss"]) for m in metrics]
        accs = [float(m["acc"]) for m in metrics]
        assert all(m["struct_overflow"] == 0 for m in metrics)
        assert all(m["feat_overflow"] == 0 for m in metrics)
        c, t = -1, -1  # sampled eval is the hbm path's job
    else:
        sg = ShardedGraph.build(hg, mesh, axis_name=ax)
        store = ShardedFeatureStore(
            arrays["features"], mesh, axis_name=ax, hierarchical=True
        )
        labels_padded = np.zeros(
            (store.shard_size * store.num_shards, 1), np.int32
        )
        labels_padded[: meta["num_nodes"], 0] = arrays["labels"]
        labels = jax.device_put(
            labels_padded, NamedSharding(mesh, P(ax, None))
        )
        trainer = DistTrainer(model=model, fan_out=(4, 4), store=store, sgraph=sg)
        # process-local init params -> explicit global replication (required
        # in multi-process mode: local committed arrays cannot feed a
        # global mesh)
        state = replicate_to_mesh(
            jax.tree.map(np.asarray, trainer.init_state(jax.random.key(0))),
            mesh,
        )
        for step in range(STEPS):
            sel = np.random.default_rng(step).choice(
                len(train), BATCH, replace=False
            )
            seeds = jax.device_put(train[sel].astype(np.int32), seed_sh)
            mask = jax.device_put(np.ones(BATCH, bool), seed_sh)
            state, m = trainer.train_step(
                state, sg.shard_args(), labels, seeds, mask, key
            )
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
            assert int(m["overflow"]) == 0
            assert int(m["sampler_overflow"]) == 0

        # distributed eval on the cluster too
        val = arrays["valid_idx"]
        vsel = val[np.arange(BATCH) % len(val)].astype(np.int32)
        c, t = trainer.eval_step(
            state.params, sg.shard_args(), labels,
            jax.device_put(vsel, seed_sh),
            jax.device_put(np.ones(BATCH, bool), seed_sh),
            key,
        )
    result = {
        "process_id": pid,
        "tier": tier,
        "num_processes": num_procs,
        "process_count": int(jax.process_count()),
        "global_devices": int(jax.device_count()),
        "local_devices": int(jax.local_device_count()),
        "losses": losses,
        "accs": accs,
        "eval_correct": int(c),
        "eval_total": int(t),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
