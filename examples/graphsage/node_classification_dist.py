"""Multi-process distributed node classification — the torchrun analog.

Counterpart of ``example/graphsage/node_classification_dist.py`` in the
reference: there, torchrun launches one process per GPU, a *global* NCCL
process group carries DDP gradient all-reduce and a *per-node subgroup*
carries the P2P cache traffic (reference :43-44, :305-306).  Here the two
groups collapse into one global ``('host', 'data')`` mesh: each OS process
owns its local devices, rendezvous goes through the JAX coordinator, and
a single jitted SPMD step does sharded sampling + hierarchical feature
exchange (cheap intra-host axis, expensive inter-host axis) + gradient
psum over the product axis.

Runs:
  2-process CPU cluster (laptop/CI):
      python node_classification_dist.py --procs 2 --epochs 2
  one rank per host on a real pod (run on every host):
      python node_classification_dist.py --procs N --process-id R \
          --coordinator HOST:PORT --tpu

With ``--procs N`` and no ``--process-id``, this file is the LAUNCHER: it
spawns N copies of itself as workers over localhost (the torchrun role)
and streams rank 0's output.

Every process builds the same deterministic host-side dataset (seeded
numpy), the multi-process contract for global ``device_put``
(NOTES.md: bit-identical host builds across ranks).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2,
                    help="number of OS processes (hosts) in the cluster")
    ap.add_argument("--process-id", type=int, default=None,
                    help="this rank (workers only; omit to run the launcher)")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator HOST:PORT (workers only)")
    ap.add_argument("--devices-per-process", type=int, default=4,
                    help="local CPU devices per process (ignored with --tpu)")
    ap.add_argument("--tpu", action="store_true",
                    help="real pod: jax.distributed.initialize over DCN "
                         "instead of the gloo CPU cluster")
    ap.add_argument("--num-nodes", type=int, default=4_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--feature-dim", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=256,
                    help="global batch (rounded to the mesh size)")
    ap.add_argument("--fan-out", default="10,10")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--model", default="sage", choices=["sage", "gat", "gcn"])
    ap.add_argument("--hot-frac", type=float, default=0.1,
                    help="fraction of nodes replicated into per-device hot tiers")
    ap.add_argument("--tier", default="hbm", choices=["hbm", "dist-host"],
                    help="data plane: all-HBM sharded stores, or the "
                         "host-RAM-resident base (features AND structure "
                         "staged per batch — the reference's pinned-host "
                         "deployment shape)")
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args()


def launch(args) -> int:
    """torchrun role: spawn --procs workers of this file over localhost."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own local device count
    cmd_base = [sys.executable, os.path.abspath(__file__)]
    passthrough = []
    for k in ("num_nodes", "avg_degree", "feature_dim", "epochs", "batch_size",
              "hidden", "hot_frac", "seed", "devices_per_process", "procs"):
        passthrough += [f"--{k.replace('_', '-')}", str(getattr(args, k))]
    passthrough += ["--fan-out", args.fan_out, "--model", args.model,
                    "--tier", args.tier]
    if args.tpu:
        passthrough += ["--tpu"]
    procs, logs = [], []
    try:
        for r in range(args.procs):
            cmd = cmd_base + passthrough + [
                "--process-id", str(r), "--coordinator", f"localhost:{port}",
            ]
            # rank 0 inherits stdout; other ranks log to files
            out = None if r == 0 else open(f"/tmp/ncdist_rank{r}.log", "w")
            logs.append(out)
            procs.append(subprocess.Popen(cmd, env=env, stdout=out, stderr=out))
        rc = 0
        # poll so a dead rank terminates its siblings instead of leaving
        # them blocked in a collective forever
        pending = set(range(args.procs))
        while pending:
            for r in list(pending):
                ret = procs[r].poll()
                if ret is None:
                    continue
                pending.discard(r)
                if ret != 0:
                    if rc == 0:
                        rc = ret
                    print(f"rank {r} exited {ret}"
                          + ("" if r == 0 else f" (log: /tmp/ncdist_rank{r}.log)"))
                    for q in pending:
                        procs[q].terminate()
            time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for out in logs:
            if out is not None:
                out.close()
    return rc


def run_worker(args) -> None:
    from dist_gnn_tpu.parallel.mesh import (
        initialize_cpu_cluster,
        initialize_distributed,
        replicate_to_mesh,
    )

    if args.tpu:
        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.procs,
            process_id=args.process_id,
        )
    else:
        initialize_cpu_cluster(
            args.coordinator, args.procs, args.process_id,
            devices_per_process=args.devices_per_process,
        )
    from dist_gnn_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dist_gnn_tpu.cache.builder import build_cache_plan
    from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import GAT, GCN, SAGE
    from dist_gnn_tpu.parallel import DistTrainer, ShardedFeatureStore, make_mesh
    from dist_gnn_tpu.parallel.graph_dist import ShardedGraph

    rank0 = jax.process_index() == 0
    mesh = make_mesh(axis_names=("host", "data"))
    ax = ("host", "data")
    n_dev = jax.device_count()
    fan_out = tuple(int(x) for x in args.fan_out.split(","))

    # identical deterministic dataset on every process (global device_put
    # requires equal host values on all ranks)
    arrays, meta = make_synthetic_dataset(
        num_nodes=args.num_nodes, avg_degree=args.avg_degree,
        feature_dim=args.feature_dim, seed=args.seed,
    )
    hg = HostGraph(indptr=arrays["indptr"], indices=arrays["indices"])

    # heat-driven hot tiers, one plan shared by structure + features
    parts = np.array_split(np.asarray(arrays["train_idx"]), n_dev)
    cap = max(1, int(args.num_nodes * args.hot_frac / n_dev)) * (
        4 * (args.avg_degree + 2) + 4 * args.feature_dim
    )
    _, s_hot, f_hot = build_cache_plan(
        hg, meta["feature_dim"], parts, fan_out, capacity_bytes=cap,
        policy="selfish",
    )
    model_cls = {"sage": SAGE, "gat": GAT, "gcn": GCN}[args.model]
    model = model_cls(meta["feature_dim"], args.hidden, meta["num_classes"],
                      len(fan_out))
    if args.tier == "dist-host":
        # host-RAM base for features AND structure: per-batch staging into
        # per-chip hot tiers over the 2-tier mesh (the reference's
        # pinned-host deployment — node_classification_dist.py:305-306 +
        # pin_memory.cc:7-12)
        from dist_gnn_tpu.parallel.host_dist import (
            DistHostFeatureStore,
            DistHostTrainer,
        )
        from dist_gnn_tpu.parallel.host_struct import DistHostCSCStore

        # derive the tier knobs from the same batch simulation that tunes
        # the sampler (round-4 VERDICT #8 — no hardcoded budget constants)
        from dist_gnn_tpu.cache.autotune import tune_dist_tier

        tier = tune_dist_tier(
            arrays["indptr"], arrays["indices"], arrays["train_idx"],
            max(1, args.batch_size // n_dev), fan_out, n_dev,
            hot_ids=s_hot, num_nodes=meta["num_nodes"],
        )
        gstore = DistHostCSCStore(
            hg, mesh, s_hot, miss_budget=tier.struct_miss_budget,
            deg_cap=tier.deg_cap, axis_name=ax,
        )
        store = DistHostFeatureStore(
            arrays["features"], mesh, f_hot,
            miss_budget=tier.feat_miss_budget, axis_name=ax,
        )
        trainer = DistHostTrainer(
            model=model, fan_out=fan_out, store=store, gstore=gstore,
            dedup_last=False,
        )
        sg = labels = None
    else:
        sg = ShardedGraph.build(hg, mesh, axis_name=ax, hot_ids=s_hot)
        store = ShardedFeatureStore(
            arrays["features"], mesh, axis_name=ax, hot_ids=f_hot,
            hierarchical=True,
        )
        labels_padded = np.zeros(
            (store.shard_size * store.num_shards, 1), np.int32
        )
        labels_padded[: meta["num_nodes"], 0] = arrays["labels"]
        labels = jax.device_put(labels_padded, NamedSharding(mesh, P(ax, None)))
        trainer = DistTrainer(
            model=model, fan_out=fan_out, store=store, sgraph=sg
        )
    # process-local init params -> explicit global replication
    state = replicate_to_mesh(
        jax.tree.map(np.asarray, trainer.init_state(jax.random.key(args.seed))),
        mesh,
    )
    key = jax.random.wrap_key_data(
        jax.device_put(
            np.asarray(jax.random.key_data(jax.random.key(args.seed + 1))),
            NamedSharding(mesh, P()),
        )
    )
    seed_sh = NamedSharding(mesh, P(ax))
    batch = max(n_dev, args.batch_size // n_dev * n_dev)
    train = np.asarray(arrays["train_idx"], np.int32)
    valid = np.asarray(arrays["valid_idx"], np.int32)
    if rank0:
        print(
            f"cluster: {jax.process_count()} processes x "
            f"{jax.local_device_count()} devices, mesh={dict(mesh.shape)} "
            f"nodes={meta['num_nodes']} edges={meta['num_edges']} "
            f"model={args.model} batch={batch}",
            flush=True,
        )

    def pad_batch(ids):
        """Pad a (possibly short) id slice to the fixed global batch with
        mask=False entries — short final slices train/eval correctly
        instead of being dropped or crashing device_put (advisor round-2
        findings: epochs with len < batch raised; eval silently skipped
        partial batches)."""
        s = np.zeros(batch, np.int32)
        m = np.zeros(batch, bool)
        s[: len(ids)] = ids
        m[: len(ids)] = True
        return s, m

    steps = max(1, -(-len(train) // batch))
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        perm = np.random.default_rng(1000 + epoch).permutation(len(train))
        losses, accs = [], []
        if args.tier == "dist-host":
            batches = [
                pad_batch(train[perm[s * batch : (s + 1) * batch]])
                for s in range(steps)
            ]
            state, ms = trainer.train_batches(
                state, None, np.asarray(arrays["labels"]), batches,
                jax.random.fold_in(key, epoch),
            )
            losses = [float(m["loss"]) for m in ms]
            accs = [float(m["acc"]) for m in ms]
        else:
            for s in range(steps):
                sel, mask_np = pad_batch(train[perm[s * batch : (s + 1) * batch]])
                seeds = jax.device_put(sel, seed_sh)
                mask = jax.device_put(mask_np, seed_sh)
                state, m = trainer.train_step(
                    state, sg.shard_args(), labels, seeds, mask, key
                )
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
        # device_sync, not block_until_ready: the latter returns before
        # remote completion on tunneled TPU backends (NOTES fact #1), so
        # the printed epoch time would measure dispatch, not execution
        from dist_gnn_tpu.utils.timing import device_sync

        device_sync(state.params)
        dt = time.perf_counter() - t0

        correct = total = 0
        eval_steps = max(1, -(-len(valid) // batch))
        if args.tier == "dist-host":
            vbatches = [
                pad_batch(valid[s * batch : (s + 1) * batch])
                for s in range(eval_steps)
            ]
            correct, total = trainer.eval_batches(
                state.params, None, np.asarray(arrays["labels"]), vbatches, key
            )
        else:
            for s in range(eval_steps):
                vsel, vmask = pad_batch(valid[s * batch : (s + 1) * batch])
                c, t = trainer.eval_step(
                    state.params, sg.shard_args(), labels,
                    jax.device_put(vsel, seed_sh),
                    jax.device_put(vmask, seed_sh),
                    key,
                )
                correct += int(c)
                total += int(t)
        if rank0:
            print(
                f"epoch {epoch}: loss={float(np.mean(losses)):.4f} "
                f"train_acc={float(np.mean(accs)):.4f} "
                f"val_acc={correct / max(total, 1):.4f} time={dt:.2f}s",
                flush=True,
            )
    if rank0:
        print("done", flush=True)


def main():
    args = parse_args()
    if args.process_id is None:
        if args.coordinator:
            sys.exit("--coordinator requires --process-id (worker mode)")
        sys.exit(launch(args))
    run_worker(args)


if __name__ == "__main__":
    main()
