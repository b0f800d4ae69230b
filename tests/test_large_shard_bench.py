"""Smoke test for tools/large_shard_bench.py — the ≥2M-point single-shard
evidence harness (BENCH.md records the full-size run; this pins the
plumbing and the kernel's recall contract at a CI-sized shard)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_large_shard_bench_small():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "large_shard_bench.py"), "20000"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["n_points"] == 20000
    assert rep["n_cells"] == 142  # ceil(sqrt(20000))
    sweep = {int(k): v for k, v in rep["sweep"].items()}
    efs = sorted(sweep)
    # budgets scale with sqrt(n): top budget is 4*sqrt(n)
    assert efs[-1] == 4 * 142
    recalls = [sweep[ef]["recall@10"] for ef in efs]
    # monotone (within rounding) and floor/ceiling: >=0.9 at sqrt(n)-budget,
    # ~1.0 at 4*sqrt(n) on the low-rank mixture
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert sweep[142]["recall@10"] >= 0.9
    assert recalls[-1] >= 0.99
    assert all(v["qps"] > 0 for v in sweep.values())
