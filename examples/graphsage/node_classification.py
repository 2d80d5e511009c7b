"""Mini-batch GraphSAGE/GAT node classification — the flagship example.

Counterpart of ``example/graphsage/node_classification.py`` in the
reference, with argparse parity for the shared knobs (batch-size, fan-out,
bias, epochs, hidden) plus TPU-era additions (bf16, frontier caps,
distributed mesh mode, checkpointing, structured metrics).

Differences by design: one process drives the whole mesh (SPMD), the train
step is a single jitted function (sample + gather + train), and timing uses
real completion fences (utils/timing.py) instead of cuda synchronize.

Runs:
  correctness (CPU):  python node_classification.py --cpu --epochs 3
  single TPU chip:    python node_classification.py
  whole mesh:         python node_classification.py --dist
  weighted sampling:  python node_classification.py --bias
  GAT aggregation:    python node_classification.py --model gat
  GCN aggregation:    python node_classification.py --model gcn
  bigger-than-HBM:    python node_classification.py --tier host
  3-tier mesh:        python node_classification.py --tier dist-host
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--root", default="/tmp/dist_gnn_datasets")
    ap.add_argument("--num-nodes", type=int, default=10_000)
    ap.add_argument("--avg-degree", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fan-out", default="10,10")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--model", default="sage", choices=["sage", "gat", "gcn"])
    ap.add_argument("--bias", action="store_true", help="weighted sampling")
    ap.add_argument("--replace", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="bf16 features+compute")
    ap.add_argument("--frontier-caps", default=None,
                    help="comma budgets per hop (sampling order)")
    ap.add_argument("--autotune", action="store_true",
                    help="derive window/budget/frontier-cap knobs from the "
                         "graph (cache.autotune.tune_sampler; overrides "
                         "--frontier-caps)")
    ap.add_argument("--dist", action="store_true",
                    help="shard over all devices (features+structure+DP)")
    ap.add_argument("--tier", default="hbm",
                    choices=["hbm", "host", "dist-host"],
                    help="feature residency: hbm (default), host = host-RAM "
                         "base + HBM hot tier + staged misses (graphs bigger "
                         "than HBM), dist-host = the same over the mesh with "
                         "peer-hot ICI serving")
    ap.add_argument("--hot-frac", type=float, default=0.2,
                    help="fraction of nodes in the HBM hot tier (tier!=hbm)")
    ap.add_argument("--miss-budget", type=int, default=0,
                    help="staged miss rows per batch (0 = auto)")
    ap.add_argument("--host-struct", action="store_true",
                    help="tier!=hbm: keep the graph TOPOLOGY host-resident "
                         "too (HBM hot sub-CSR + per-hop staged adjacency)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="fuse U consecutive steps into one jitted program "
                         "(Trainer.train_step_multi; single-chip hbm tier "
                         "only) — amortizes dispatch and lets XLA schedule "
                         "across steps")
    ap.add_argument("--checkpoint", default=None, help="save path prefix")
    ap.add_argument("--resume", default=None, help="load path prefix")
    ap.add_argument("--metrics-log", default=None, help="JSONL metrics path")
    ap.add_argument("--full-eval", action="store_true",
                    help="final full-graph layer-wise inference accuracy (SAGE or GAT)")
    ap.add_argument("--profile", action="store_true",
                    help="report Sampling/Loading/Training ms per iter "
                         "(reference-format phase split, slope-timed)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (8 devices)")
    return ap.parse_args()


def run_host_tier(args, arrays, meta, hg, model, fan_out, log):
    """Host-resident feature base (graphs bigger than HBM): single-chip
    double-buffered pipeline (--tier host) or the mesh-wide three-tier
    data plane (--tier dist-host)."""
    import jax
    import numpy as np

    from dist_gnn_tpu.ops.heat import get_node_heat
    from dist_gnn_tpu.dataloading import SeedGenerator

    graph = hg.to_device()
    feats = np.asarray(arrays["features"])
    labels = np.asarray(arrays["labels"], dtype=np.int32)
    N = meta["num_nodes"]
    C_total = max(1, int(N * args.hot_frac))
    _, f_heat = get_node_heat(
        graph, np.asarray(arrays["train_idx"], np.int32), list(fan_out)
    )
    order = np.argsort(-np.asarray(f_heat))  # hottest first

    from dist_gnn_tpu.sampler import layer_capacities

    frontier_cap = layer_capacities(args.batch_size, fan_out)[-1]
    miss_budget = args.miss_budget or frontier_cap

    if args.tier == "host":
        from dist_gnn_tpu.host_tier import HostCSCStore, HostFeatureStore
        from dist_gnn_tpu.training.pipeline import HostTierTrainer

        store = HostFeatureStore(
            feats, order[:C_total].astype(np.int32), miss_budget=miss_budget
        )
        gstore = (
            HostCSCStore(
                hg, order[:C_total].astype(np.int32),
                miss_budget=miss_budget,
            )
            if args.host_struct
            else None
        )
        trainer = HostTierTrainer(
            model=model, fan_out=fan_out, store=store, gstore=gstore,
            dedup_last=False,
        )
        world_batch = args.batch_size
    else:
        from dist_gnn_tpu.parallel import make_mesh
        from dist_gnn_tpu.parallel.host_dist import (
            DistHostFeatureStore,
            DistHostTrainer,
        )

        mesh = make_mesh()
        n = mesh.shape["data"]
        C = max(1, C_total // n)
        hot = order[: n * C].reshape(n, C).astype(np.int32)  # selfless plan
        store = DistHostFeatureStore(
            feats, mesh, hot, miss_budget=miss_budget
        )
        gstore = None
        if args.host_struct:
            from dist_gnn_tpu.parallel.host_struct import DistHostCSCStore

            gstore = DistHostCSCStore(
                hg, mesh, hot, miss_budget=miss_budget
            )
        trainer = DistHostTrainer(
            model=model, fan_out=fan_out, store=store, gstore=gstore,
            dedup_last=False,
        )
        world_batch = max(n, args.batch_size // n * n)

    state = trainer.init_state(jax.random.key(args.seed))
    print(
        f"tier={args.tier}: base {feats.nbytes / 2**20:.0f} MiB host-resident, "
        f"hot {C_total} rows in HBM, miss budget {miss_budget}"
    )
    gen = SeedGenerator(arrays["train_idx"], world_batch, shuffle=True,
                        drop_last=True)
    import time as _time

    for epoch in range(args.epochs):
        t0 = _time.perf_counter()
        batches = [
            (np.asarray(s), np.asarray(m))
            for s, m in gen.epoch(jax.random.key(1000 + epoch))
        ]
        state, ms = trainer.train_batches(
            state, graph, labels, batches, jax.random.key(epoch)
        )
        # device_sync, not block_until_ready: the latter returns before
        # remote completion on tunneled TPU backends (NOTES fact #1), so
        # the printed epoch time would measure dispatch, not execution
        from dist_gnn_tpu.utils.timing import device_sync

        device_sync(state.params)
        dt = _time.perf_counter() - t0
        loss = float(np.mean([float(m["loss"]) for m in ms]))
        acc = float(np.mean([float(m["acc"]) for m in ms]))
        miss = int(np.mean([m["feat_miss"] for m in ms]))
        ovf = sum(int(m["feat_overflow"]) for m in ms)
        print(
            f"epoch {epoch}: loss={loss:.4f} train_acc={acc:.4f} "
            f"miss/batch={miss} overflow={ovf} time={dt:.2f}s"
        )
        log.log("epoch", epoch=epoch, loss=loss, train_acc=acc,
                feat_miss=miss, feat_overflow=ovf, time_s=dt)
    log.close()


def main():
    args = parse_args()
    if args.cpu:
        from dist_gnn_tpu.utils.platform import force_cpu

        force_cpu(8)

    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.dataloading import SeedGenerator
    from dist_gnn_tpu.dataloading.preprocess import load_dataset, make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import GAT, GCN, SAGE
    from dist_gnn_tpu.training import Trainer
    from dist_gnn_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from dist_gnn_tpu.utils.metrics import MetricsLogger
    from dist_gnn_tpu.utils.timing import device_sync

    fan_out = tuple(int(x) for x in args.fan_out.split(","))
    caps = (
        tuple(int(x) for x in args.frontier_caps.split(","))
        if args.frontier_caps
        else None
    )
    log = MetricsLogger(path=args.metrics_log, stdout=False)
    multi_step_fn = None  # set on the single-chip hbm path when --unroll > 1

    if args.dataset == "synthetic":
        arrays, meta = make_synthetic_dataset(
            num_nodes=args.num_nodes,
            avg_degree=args.avg_degree,
            with_probs=args.bias,
            seed=args.seed,
        )
    else:
        arrays, meta = load_dataset(args.root, args.dataset)

    hg = HostGraph(
        indptr=np.asarray(arrays["indptr"]),
        indices=np.asarray(arrays["indices"]),
        probs=np.asarray(arrays["probs"]) if args.bias and "probs" in arrays else None,
    )
    feat_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    print(
        f"dataset={meta['name']} nodes={meta['num_nodes']} edges={meta['num_edges']} "
        f"feat={meta['feature_dim']} classes={meta['num_classes']} "
        f"devices={len(jax.devices())} dist={args.dist}"
    )

    model_cls = {"sage": SAGE, "gat": GAT, "gcn": GCN}[args.model]
    kwargs = dict(compute_dtype=compute_dtype)
    model = model_cls(
        in_feats=meta["feature_dim"],
        n_hidden=args.hidden,
        n_classes=meta["num_classes"],
        num_layers=len(fan_out),
        **kwargs,
    )

    if args.tier != "hbm":
        run_host_tier(args, arrays, meta, hg, model, fan_out, log)
        return

    if args.dist:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dist_gnn_tpu.parallel import (
            DistTrainer,
            ShardedFeatureStore,
            make_mesh,
        )
        from dist_gnn_tpu.parallel.graph_dist import ShardedGraph

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        sg = ShardedGraph.build(hg, mesh)
        store = ShardedFeatureStore(
            np.asarray(arrays["features"], dtype=feat_dtype), mesh
        )
        labels_padded = np.zeros((store.shard_size * store.num_shards, 1), np.int32)
        labels_padded[: meta["num_nodes"], 0] = np.asarray(arrays["labels"])
        labels = jax.device_put(labels_padded, NamedSharding(mesh, P("data", None)))
        trainer = DistTrainer(
            model=model, fan_out=fan_out, store=store, sgraph=sg,
            replace=args.replace,
        )
        graph_arg = sg.shard_args()
        # round the global batch to the mesh
        args.batch_size = max(n_dev, args.batch_size // n_dev * n_dev)
        step_fn = lambda st, seeds, mask, key: trainer.train_step(
            st, graph_arg, labels, seeds, mask, key
        )
        # distributed sampled validation eval (DistTrainer.eval_step runs the
        # same sharded sample→exchange→forward pipeline, psums correct/total)
        eval_fn = lambda params, seeds, mask, key: trainer.eval_step(
            params, graph_arg, labels, seeds, mask, key
        )
    else:
        graph = hg.to_device(with_alias=args.bias and hg.probs is not None)
        features = jnp.asarray(np.asarray(arrays["features"])).astype(feat_dtype)
        labels_1d = jnp.asarray(np.asarray(arrays["labels"], dtype=np.int32))
        tuner_kw = {}
        if args.autotune:
            from dist_gnn_tpu.cache.autotune import tune_sampler_for

            cfg = tune_sampler_for(
                hg, np.asarray(arrays["train_idx"]), args.batch_size, fan_out
            )
            print(f"autotuned sampler config: {cfg}")
            tuner_kw = cfg.trainer_kwargs()
            caps = None
        trainer = Trainer(
            model=model, fan_out=fan_out, replace=args.replace,
            **(tuner_kw or dict(frontier_caps=caps)),
        )
        step_fn = lambda st, seeds, mask, key: trainer.train_step(
            st, graph, features, labels_1d, seeds, mask, key
        )
        if args.unroll > 1:
            multi_step_fn = lambda st, sU, mU, key: trainer.train_step_multi(
                st, graph, features, labels_1d, sU, mU, key
            )
        eval_fn = lambda params, seeds, mask, key: trainer.eval_step(
            params, graph, features, labels_1d, seeds, mask, key
        )

    state = trainer.init_state(jax.random.key(args.seed))
    if args.resume:
        state = load_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    train_gen = SeedGenerator(arrays["train_idx"], args.batch_size, shuffle=True)
    valid_gen = SeedGenerator(arrays["valid_idx"], args.batch_size)

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses, accs = [], []
        pending = []
        for step, (seeds, mask) in enumerate(
            train_gen.epoch(jax.random.key(1000 + epoch))
        ):
            if args.unroll > 1 and multi_step_fn is not None:
                pending.append((seeds, mask))
                if len(pending) < args.unroll:
                    continue
                sU = jnp.stack([s_ for s_, _ in pending])
                mU = jnp.stack([m_ for _, m_ in pending])
                pending = []
                state, metrics = multi_step_fn(
                    state, sU, mU, jax.random.key(epoch)
                )
            else:
                state, metrics = step_fn(
                    state, seeds, mask, jax.random.key(epoch)
                )
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        # leftover batches of a partial unroll group run one at a time
        for seeds, mask in pending:
            state, metrics = step_fn(state, seeds, mask, jax.random.key(epoch))
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        device_sync(state.params)
        dt = time.perf_counter() - t0
        loss = float(jnp.mean(jnp.stack(losses)))
        acc = float(jnp.mean(jnp.stack(accs)))

        val_msg = ""
        if eval_fn is not None:
            correct = total = 0
            for seeds, mask in valid_gen.epoch(jax.random.key(2)):
                c, t = eval_fn(state.params, seeds, mask, jax.random.key(3))
                correct += int(c)
                total += int(t)
            val_msg = f" val_acc={correct / max(total, 1):.4f}"
        print(
            f"epoch {epoch}: loss={loss:.4f} train_acc={acc:.4f}{val_msg} "
            f"time={dt:.2f}s"
        )
        log.log("epoch", epoch=epoch, loss=loss, train_acc=acc, time_s=dt)
        if args.checkpoint:
            save_checkpoint(args.checkpoint, state)

    if args.profile and not args.dist:
        # phase split in the reference's report format
        # (example/graphsage/node_classification.py:252-260) — measured as
        # standalone phases since the fused step has no internal fences
        import jax.numpy as jnp2

        from dist_gnn_tpu.sampler import sample_blocks
        from dist_gnn_tpu.utils.timing import measure_chain

        seeds0, mask0 = next(train_gen.epoch(jax.random.key(77)))

        def phase_sample(c):
            b, _ = sample_blocks(
                graph, seeds0, mask0, fan_out, args.replace,
                jax.random.fold_in(jax.random.key(0), c[0]),
            )
            return (c[0] + 1, b[-1].frontier)

        t_sample = measure_chain(phase_sample, (jnp2.zeros((), jnp2.int32), None))
        blocks0, _ = sample_blocks(
            graph, seeds0, mask0, fan_out, args.replace, jax.random.key(0)
        )
        inp = blocks0[-1]

        def phase_load(c):
            safe = jnp2.where(inp.frontier_mask, inp.frontier, 0)
            rows = jnp2.where(
                inp.frontier_mask[:, None], features[safe + c[0]], 0
            )
            return (c[0], rows)

        t_load = measure_chain(phase_load, (jnp2.zeros((), jnp2.int32), None))

        def phase_train(c):
            st, _ = trainer.train_step(
                c[0], graph, features, labels_1d, seeds0, mask0, jax.random.key(1)
            )
            return (st,)

        t_full = measure_chain(phase_train, (state,))
        # residual can undercut 0 when XLA fuses phases inside the single
        # jit better than the standalone phase programs run
        resid = max(t_full - t_sample - t_load, 0.0)
        print(
            f"profile: Sampling {t_sample*1e3:.2f} ms | Loading {t_load*1e3:.2f} ms | "
            f"Training(resid) {resid*1e3:.2f} ms | "
            f"Iteration {t_full*1e3:.2f} ms (fused step)"
        )
        log.log(
            "profile",
            sampling_ms=t_sample * 1e3,
            loading_ms=t_load * 1e3,
            iteration_ms=t_full * 1e3,
        )

    if args.full_eval:
        if args.dist:
            # sharded activations + ring rotation: the papers100M-scale path
            from dist_gnn_tpu.parallel.inference_dist import (
                dist_full_graph_inference,
            )

            logits = dist_full_graph_inference(
                model, state.params, hg, np.asarray(arrays["features"]), mesh
            )
        else:
            from dist_gnn_tpu.models.inference import full_graph_inference

            logits = full_graph_inference(
                model, state.params, hg,
                jnp.asarray(np.asarray(arrays["features"])),
            )
        pred = np.asarray(jnp.argmax(np.asarray(logits), axis=-1))
        test = np.asarray(arrays["test_idx"])
        acc = float((pred[test] == np.asarray(arrays["labels"])[test]).mean())
        print(f"full-graph test accuracy: {acc:.4f}")
        log.log("full_eval", test_acc=acc)

    log.close()


if __name__ == "__main__":
    main()
