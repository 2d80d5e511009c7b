"""E2E drive of the multi-process example app (the torchrun-analog launcher).

Complements test_multiprocess.py (which checks numeric DDP-equivalence of
the underlying cluster path): this verifies the user-facing
``examples/graphsage/node_classification_dist.py`` launcher spawns a real
2-process cluster, trains, evals, and reports.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APP = os.path.join(REPO, "examples", "graphsage", "node_classification_dist.py")


def test_launcher_two_process_cluster():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers pick their own local device count
    p = subprocess.run(
        [
            sys.executable, APP,
            "--procs", "2", "--epochs", "1",
            "--num-nodes", "1500", "--avg-degree", "8",
            "--feature-dim", "16", "--batch-size", "64",
            "--hidden", "16", "--fan-out", "4,4",
        ],
        env=env, capture_output=True, timeout=600,
    )
    out = p.stdout.decode(errors="replace")
    assert p.returncode == 0, f"launcher failed:\n{out[-3000:]}\n{p.stderr.decode(errors='replace')[-2000:]}"
    assert "mesh={'host': 2, 'data': 4}" in out, out[-2000:]
    assert "epoch 0:" in out and "done" in out, out[-2000:]
