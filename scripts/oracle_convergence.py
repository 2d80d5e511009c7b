"""Torch-CPU convergence oracle for the bench graph (round-4 VERDICT #3).

Trains an INDEPENDENT torch implementation of SAGEConv-mean (the same
math as tests/test_torch_parity.py, which is itself pinned against the
reference's DGL 'mean' aggregator semantics,
/root/reference/example/graphsage/utils/models.py:25-55) on the exact
bench dataset and splits (make_synthetic_dataset seed 0), with the bench
protocol: batch 512, fanout [15, 10, 5], hidden 256, Adam lr 1e-3 wd
5e-4, dropout 0.5, EPOCHS passes over train_idx, then full-graph
(exact full-neighborhood) validation accuracy via scipy sparse mean
aggregation — the reference's layer-wise inference protocol.

Sampling here is uniform-with-replacement for rows with deg > k and
take-all otherwise (our Feistel sampler is without-replacement; for an
accuracy target the difference is statistical noise at these fanouts).

Run once (slow on this 2-core host: ~10 min/epoch); the resulting number
is pinned as VAL_ACC_TARGET in bench.py with provenance.  Output: one
line per eval + a final PIN line.
"""
import time

import numpy as np
import scipy.sparse as sp
import torch

from dist_gnn_tpu.dataloading.preprocess import make_synthetic_dataset

EPOCHS = 2
BATCH = 512
FAN_OUT = (15, 10, 5)
HIDDEN = 256
DROPOUT = 0.5

torch.manual_seed(0)
arrays, meta = make_synthetic_dataset(
    num_nodes=500_000, avg_degree=30, feature_dim=100, num_classes=47,
    train_frac=0.2, seed=0,
)
indptr = arrays["indptr"].astype(np.int64)
indices = arrays["indices"].astype(np.int64)
N = len(indptr) - 1
deg = np.diff(indptr)
feats = torch.tensor(arrays["features"])
labels_np = arrays["labels"].astype(np.int64)
labels = torch.tensor(labels_np)
rng = np.random.default_rng(0)

# full-graph mean-aggregation operator for the exact validation protocol
A = sp.csr_matrix(
    (np.ones(len(indices), np.float32), indices, indptr), shape=(N, N)
)
inv_deg = (1.0 / np.maximum(deg, 1)).astype(np.float32)


def sample_hop(seeds, k):
    """[S] global ids -> ([S, k] neighbor ids, [S, k] mask)."""
    d = deg[seeds]
    start = indptr[seeds]
    r = rng.random((len(seeds), k))
    pos = np.floor(r * np.maximum(d, 1)[:, None]).astype(np.int64)
    take_all = d[:, None] <= k
    j = np.broadcast_to(np.arange(k), pos.shape)
    pos = np.where(take_all, np.minimum(j, np.maximum(d, 1)[:, None] - 1), pos)
    mask = j < np.minimum(d[:, None], k)
    # deg-0 rows: start may equal nnz (last node) — clamp the read; the
    # mask already drops every slot of such rows
    idx = np.minimum(start[:, None] + pos, len(indices) - 1)
    ids = indices[idx]
    return ids, mask


def sample_blocks(seeds):
    """Reverse-fanout multi-hop sampling with per-hop dedup (reference
    pipeline shape).  Returns (blocks, input_ids); blocks outermost-first
    as (num_dst, slots [S, k] local-into-next-frontier, mask)."""
    blocks = []
    cur = seeds
    for k in reversed(FAN_OUT):
        nbr, mask = sample_hop(cur, k)
        frontier, inv = np.unique(
            np.concatenate([cur, nbr.reshape(-1)]), return_inverse=True
        )
        # seeds-first invariant: remap so cur occupies the first slots
        order = np.empty(len(frontier), np.int64)
        seed_pos = inv[: len(cur)]
        is_seed = np.zeros(len(frontier), bool)
        is_seed[seed_pos] = True
        order[seed_pos] = np.arange(len(cur))
        rest = np.flatnonzero(~is_seed)
        order[rest] = len(cur) + np.arange(len(rest))
        new_frontier = np.empty(len(frontier), np.int64)
        new_frontier[order] = frontier
        slots = order[inv[len(cur):]].reshape(nbr.shape)
        blocks.append((len(cur), slots, mask))
        cur = new_frontier
    # blocks are in SAMPLING order (innermost hop first); forward() walks
    # them reversed so layer 0 consumes the outermost frontier's features
    return blocks, cur


class TorchSAGE(torch.nn.Module):
    def __init__(self, d_in, d_h, d_out, L):
        super().__init__()
        dims = [(d_in if l == 0 else d_h, d_out if l == L - 1 else d_h)
                for l in range(L)]
        self.w_self = torch.nn.ParameterList()
        self.w_neigh = torch.nn.ParameterList()
        self.b = torch.nn.ParameterList()
        g = torch.Generator().manual_seed(1)
        for di, do in dims:
            lim = (6.0 / (di + do)) ** 0.5
            self.w_self.append(torch.nn.Parameter(
                (torch.rand(di, do, generator=g) * 2 - 1) * lim))
            self.w_neigh.append(torch.nn.Parameter(
                (torch.rand(di, do, generator=g) * 2 - 1) * lim))
            self.b.append(torch.nn.Parameter(torch.zeros(do)))

    def forward(self, blocks, x, train):
        h = x
        L = len(self.b)
        for l, (S, slots, mask) in enumerate(reversed(blocks)):
            nb = h[torch.tensor(slots)]
            mk = torch.tensor(mask, dtype=h.dtype)[..., None]
            h_mean = (nb * mk).sum(1) / mk.sum(1).clamp(min=1.0)
            h = h[:S] @ self.w_self[l] + h_mean @ self.w_neigh[l] + self.b[l]
            if l != L - 1:
                h = torch.relu(h)
                if train:
                    h = torch.nn.functional.dropout(h, DROPOUT)
        return h

    @torch.no_grad()
    def full_graph_acc(self, idx):
        h = feats.numpy()
        L = len(self.b)
        for l in range(L):
            h_mean = (A @ h) * inv_deg[:, None]
            h = (
                h @ self.w_self[l].detach().numpy()
                + h_mean @ self.w_neigh[l].detach().numpy()
                + self.b[l].detach().numpy()
            )
            if l != L - 1:
                h = np.maximum(h, 0)
        pred = h[idx].argmax(1)
        return float((pred == labels_np[idx]).mean())


model = TorchSAGE(feats.shape[1], HIDDEN, meta["num_classes"], len(FAN_OUT))
opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-4)
train_idx = arrays["train_idx"].astype(np.int64)
valid_idx = arrays["valid_idx"].astype(np.int64)

t0 = time.time()
best = 0.0
for ep in range(EPOCHS):
    order = rng.permutation(train_idx)
    n_steps = len(order) // BATCH
    for s in range(n_steps):
        seeds = order[s * BATCH : (s + 1) * BATCH]
        blocks, input_ids = sample_blocks(seeds)
        x = feats[torch.tensor(input_ids)]
        logits = model(blocks, x, train=True)
        loss = torch.nn.functional.cross_entropy(
            logits, labels[torch.tensor(seeds)]
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        if s % 20 == 0:
            print(f"ep {ep} step {s}/{n_steps} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    acc = model.full_graph_acc(valid_idx)
    best = max(best, acc)
    print(f"EPOCH {ep}: val_acc {acc:.4f} ({time.time() - t0:.0f}s)", flush=True)
print(f"PIN torch_oracle_val_acc={best:.4f} epochs={EPOCHS} "
      f"wall={time.time() - t0:.0f}s")
