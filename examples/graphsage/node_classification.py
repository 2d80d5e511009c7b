"""Mini-batch GraphSAGE node classification — the flagship example.

Counterpart of ``example/graphsage/node_classification.py`` in the
reference, with argparse parity for the shared knobs (batch-size, fan-out,
bias, cache-policy, epochs, hidden).  Differences by design: one process
drives the whole mesh (SPMD), the train step is a single jitted function
(sample + gather + train), and phase timing uses block_until_ready fences
instead of cuda synchronize.

Run (CPU correctness): JAX_PLATFORMS=cpu python node_classification.py \
    --dataset synthetic --epochs 3
Run (TPU):             python node_classification.py --dataset synthetic
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--root", default="/tmp/dist_gnn_datasets")
    ap.add_argument("--num-nodes", type=int, default=10_000)
    ap.add_argument("--avg-degree", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fan-out", default="10,10")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--num-layers", type=int, default=None)
    ap.add_argument("--model", default="sage", choices=["sage", "gat"])
    ap.add_argument("--bias", action="store_true", help="weighted sampling")
    ap.add_argument("--replace", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--cpu", action="store_true", help="force the CPU backend (8 devices)"
    )
    args = ap.parse_args()

    if args.cpu:
        from dist_gnn_tpu.utils.platform import force_cpu

        force_cpu(8)

    import jax
    import jax.numpy as jnp

    from dist_gnn_tpu.dataloading import SeedGenerator
    from dist_gnn_tpu.dataloading.preprocess import load_dataset, make_synthetic_dataset
    from dist_gnn_tpu.graph import HostGraph
    from dist_gnn_tpu.models import GAT, SAGE
    from dist_gnn_tpu.training import Trainer

    fan_out = tuple(int(x) for x in args.fan_out.split(","))
    num_layers = args.num_layers or len(fan_out)
    assert num_layers == len(fan_out)

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
    graph = hg.to_device()
    features = jnp.asarray(np.asarray(arrays["features"]))
    labels = jnp.asarray(np.asarray(arrays["labels"], dtype=np.int32))
    print(
        f"dataset={meta['name']} nodes={meta['num_nodes']} edges={meta['num_edges']} "
        f"feat={meta['feature_dim']} classes={meta['num_classes']}"
    )

    model_cls = SAGE if args.model == "sage" else GAT
    model = model_cls(
        in_feats=meta["feature_dim"],
        n_hidden=args.hidden,
        n_classes=meta["num_classes"],
        num_layers=num_layers,
    )
    trainer = Trainer(model=model, fan_out=fan_out, replace=args.replace)
    state = trainer.init_state(jax.random.key(args.seed))

    train_gen = SeedGenerator(arrays["train_idx"], args.batch_size, shuffle=True)
    valid_gen = SeedGenerator(arrays["valid_idx"], args.batch_size)

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses, accs = [], []
        for step, (seeds, mask) in enumerate(
            train_gen.epoch(jax.random.key(1000 + epoch))
        ):
            state, metrics = trainer.train_step(
                state, graph, features, labels, seeds, mask, jax.random.key(epoch)
            )
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        loss = float(jnp.mean(jnp.stack(losses)))
        acc = float(jnp.mean(jnp.stack(accs)))

        correct = total = 0
        for seeds, mask in valid_gen.epoch(jax.random.key(2)):
            c, t = trainer.eval_step(
                state.params, graph, features, labels, seeds, mask, jax.random.key(3)
            )
            correct += int(c)
            total += int(t)
        print(
            f"epoch {epoch}: loss={loss:.4f} train_acc={acc:.4f} "
            f"val_acc={correct / max(total, 1):.4f} time={dt:.2f}s"
        )


if __name__ == "__main__":
    main()
