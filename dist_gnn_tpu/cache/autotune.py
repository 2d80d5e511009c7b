"""Sampler auto-tuning: derive window/budget/cap constants from the graph.

The windowed samplers and frontier budgets are governed by static knobs
(`window=(W1, W2)`, `big_row_budget=(R1, R2)`, `frontier_caps`) that were
originally hand-measured per graph (NOTES.md).  The reference has the same
problem with its calibration constants (hardcoded bandwidth/byte numbers,
``example/graphsage/node_classification.py:79-85``, refreshed by
``scripts/``).  This module replaces magic numbers with a one-time host
pass:

  1. simulate a few mini-batch epochs with a numpy sampler (exact frontier
     semantics: per-hop distinct-neighbor draws, dedup with seeds-first
     capacity accounting, dedup-free final hop);
  2. size every static budget from the observed maxima times a slack
     factor, rounded to hardware-friendly multiples.

The result is LOSSLESS BY CONSTRUCTION for batches statistically like the
simulated ones; the runtime overflow counters (`sampler_overflow`,
`frontier_overflow`) remain the guard for distribution shift — a nonzero
count means "re-tune", never silent data loss.

Honesty note: the tuner optimizes COVERAGE, not speed — it has no cost
model for window width vs budget trade-offs, so a measured hand-tuned
config can still beat it (bench graph: hand (128,1024)/(5120,1024) runs
8.38 ms/step vs tuned (128,2048)/(7424,768) at 9.56 — probe_step26 log).
Use it for new graphs where no measurement exists; refine with a
measured grid when the last ~10% matters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    window: Tuple[int, int]
    big_row_budget: Tuple[int, int]
    frontier_caps: Tuple[int, ...]  # sampling order (deepest hop last)

    def sampler_kwargs(self) -> dict:
        """kwargs for sample_blocks / Trainer(sampler_*) call sites."""
        return dict(
            window=self.window,
            big_row_budget=self.big_row_budget,
            frontier_caps=self.frontier_caps,
        )

    def trainer_kwargs(self) -> dict:
        return dict(
            sampler_window=self.window,
            sampler_big_budget=self.big_row_budget,
            frontier_caps=self.frontier_caps,
        )


def _round_up(x: int, m: int) -> int:
    return int(-(-int(x) // m) * m)


def _pow2_at_least(x: int, lo: int = 32, hi: int = 4096) -> int:
    w = lo
    while w < min(x, hi):
        w *= 2
    return w


def tune_sampler(
    indptr: np.ndarray,
    indices: np.ndarray,
    train_idx: np.ndarray,
    batch_size: int,
    fan_out: Sequence[int],
    *,
    trials: int = 4,
    slack: float = 1.3,
    cap_slack: float = 1.05,
    r1_target: int = 8192,
    r2_target: int = 1024,
    seed: int = 0,
) -> SamplerConfig:
    """Pick (window, big_row_budget, frontier_caps) for ``sample_blocks``.

    Simulates ``trials`` batches with a numpy sampler that mirrors the real
    one's frontier accounting (distinct per-row draws; hops relabel/dedup
    except the final hop, which is dedup-free).  Static knobs come from
    observed maxima:

      * ``frontier_caps[i]``: max relabeled frontier across trials x
        ``cap_slack``, rounded up to 512 (the final hop keeps the padded
        worst case — it is never relabeled);
      * ``W1``: smallest power of two covering most frontier rows' degree
        span, chosen so at most ~``r1_target`` rows/hop overflow level 1;
      * ``R1``/``W2``/``R2``: observed level-overflow row counts x
        ``slack``, with ``W2`` sized so at most ~``r2_target`` rows need
        the exact tail.
    """
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    deg_all = np.diff(indptr).astype(np.int64)
    rng = np.random.default_rng(seed)
    fan_rev = list(reversed(list(fan_out)))

    caps_seen = [[] for _ in fan_rev]  # relabeled frontier sizes per hop
    hop_deg_samples = [[] for _ in fan_rev]  # degrees of hop seed rows

    for t in range(trials):
        seeds = rng.choice(train_idx, size=min(batch_size, len(train_idx)),
                           replace=False)
        for i, k in enumerate(fan_rev):
            deg = deg_all[seeds]
            hop_deg_samples[i].append(deg)
            # distinct neighbor draw counts: min(deg, k) per row
            take = np.minimum(deg, k)
            # sample neighbor NODES: for frontier-size estimation we need
            # the union; draw real neighbor ids row by row (vectorised via
            # repeat + per-row offsets modulo degree)
            total = int(take.sum())
            row_rep = np.repeat(np.arange(len(seeds)), take)
            # positions: for deg <= k take all; else k distinct via choice
            offs = np.empty(total, np.int64)
            pos = 0
            for r, (d, tk) in enumerate(zip(deg, take)):
                if tk == 0:
                    continue
                if d <= k:
                    offs[pos : pos + tk] = np.arange(tk)
                else:
                    offs[pos : pos + tk] = rng.choice(d, size=tk,
                                                      replace=False)
                pos += tk
            starts = indptr[seeds].astype(np.int64)
            edge_pos = starts[row_rep] + offs
            from_nodes = indices[edge_pos]
            last = i == len(fan_rev) - 1
            if last:
                break  # dedup-free final hop: capacity is the static pad
            new_front = np.unique(np.concatenate([seeds, from_nodes]))
            caps_seen[i].append(len(new_front))
            seeds = new_front

    def worst_overflow(w: int) -> int:
        """Max rows per hop whose span exceeds the level-1 window w."""
        return max(int(np.sum(d > w)) for hd in hop_deg_samples for d in hd)

    # W1: smallest power of two whose per-hop overflow fits ~r1_target —
    # smaller windows mean cheaper selects (the hitmask is O(B*k*2W)), so
    # prefer the smallest W that keeps the level-2 population bounded
    w1 = 32
    while w1 < 1024 and worst_overflow(w1) > r1_target:
        w1 *= 2
    r1 = _round_up(max(256, worst_overflow(w1) * slack), 256)

    w2 = w1 * 2
    while w2 < 8192 and worst_overflow(w2) > r2_target:
        w2 *= 2
    r2 = _round_up(max(128, worst_overflow(w2) * slack), 128)

    caps = []
    pad = batch_size  # worst-case frontier pad chain
    for i, k in enumerate(fan_rev):
        pad = pad * (k + 1)
        if i == len(fan_rev) - 1:
            caps.append(10**9)  # dedup-free final hop: no relabel cap
        else:
            worst = max(caps_seen[i])
            # never exceed the worst-case pad (a cap above it is a no-op)
            caps.append(min(_round_up(worst * cap_slack, 512), pad))
            pad = caps[-1]
    return SamplerConfig(
        window=(w1, w2), big_row_budget=(r1, r2),
        frontier_caps=tuple(caps),
    )


def tune_sampler_for(hg, train_idx, batch_size, fan_out, **kw) -> SamplerConfig:
    """:func:`tune_sampler` bound to a HostGraph."""
    return tune_sampler(
        np.asarray(hg.indptr), np.asarray(hg.indices),
        np.asarray(train_idx), batch_size, fan_out, **kw,
    )
