"""bench_dist.py smoke: the distributed scaling bench runs on the virtual
CPU mesh, prints valid JSON, and reports a lossless (zero-unserved) step.
Subprocess because it must force the CPU platform before jax init."""

import json
import subprocess
import sys


def test_bench_dist_cpu_smoke():
    out = subprocess.run(
        [
            sys.executable, "bench_dist.py", "--n-devices", "4",
            "--platform", "cpu", "--nodes", "6000", "--steps", "1",
            "--batch-per-chip", "64", "--fan-out", "5,3",
        ],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["metric"] == "dist_graphsage_train_edges_per_s"
    assert r["extra"]["overflow_unserved"] == 0
    assert r["extra"]["sampler_overflow"] == 0
    assert r["value"] > 0
    assert set(r["extra"]["predicted_scaling_vs_1chip"]) == {"2", "4", "8", "16"}
