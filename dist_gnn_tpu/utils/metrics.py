"""Structured metrics & phase timing.

Replaces the reference's print-based observability
(``example/graphsage/node_classification.py:217-260``: wall timers with
cuda synchronize around Sampling/Loading/Training, means printed with the
first 3 iters dropped).  Here:

* :class:`PhaseTimer` — named phase accumulator with warmup-drop semantics
  matching the reference's report (mean over iters > warmup);
  uses utils.timing.device_sync fences so tunneled backends measure real
  work.
* :class:`MetricsLogger` — JSON-lines structured log (stdout and/or file).

Note the fused train step intentionally has no internal phase boundaries —
per-phase numbers come from running the phases standalone (profiling
mode), not from fencing inside the hot loop like the reference does.
"""

from __future__ import annotations

import json
import sys
import time
from collections import defaultdict
from typing import Optional

from dist_gnn_tpu.utils.timing import device_sync


class PhaseTimer:
    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.samples = defaultdict(list)
        self._t0 = {}

    def start(self, phase: str) -> None:
        self._t0[phase] = time.perf_counter()

    def stop(self, phase: str, fence=None) -> float:
        if fence is not None:
            device_sync(fence)
        dt = time.perf_counter() - self._t0.pop(phase)
        self.samples[phase].append(dt)
        return dt

    def mean_ms(self, phase: str) -> float:
        # strictly post-warmup; with <= warmup samples fall back to the
        # LAST sample (least compile-contaminated) rather than averaging
        # in the first iteration's multi-second XLA compile
        s = self.samples[phase][self.warmup :] or self.samples[phase][-1:]
        return 1000.0 * sum(s) / max(len(s), 1)

    def report(self) -> dict:
        return {p: round(self.mean_ms(p), 3) for p in self.samples}


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stdout: bool = True):
        self.fh = open(path, "a") if path else None
        self.stdout = stdout

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "ts": time.time(), **fields}
        line = json.dumps(rec)
        if self.stdout:
            print(line, file=sys.stdout)
        if self.fh:
            self.fh.write(line + "\n")
            self.fh.flush()

    def close(self) -> None:
        if self.fh:
            self.fh.close()
