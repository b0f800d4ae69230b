"""Large-shard evidence for the in-shard IVF kernel (ivf_shard.py).

The reference's operating point is ~25M-point shards (1B points / 40
shards, README.md:21) served by per-shard HNSW indices built with M=32 /
ef_construction=200 (defs.h:52-56) and queried at the ef_search sweep
{50..500} (shard_searches.cpp:13). This engine's per-shard kernel is the
spilled IVF of ivf_shard.py, which executes as plain NumPy inside ONE
cogrouped applyInPandas task per (shard, query-block) — so its large-shard
behavior is exactly a single-process run at shard size, measured here at
N ≥ 2M points (an 80× step past the 20k/600k pytest+bench evidence, within
~12× of the reference's shard size).

Data: a seeded 64-component low-rank Gaussian mixture in d=64 with
intrinsic dimension 8 (component = center + A·z, z ∈ R⁸, plus small
ambient noise) — real embedding corpora have intrinsic dimension ~10-15
(SIFT/GloVe estimates), and a full-rank 64-dim Gaussian is the known
worst case for any cell-probing index (measured here: recall@10 at
ef=4√N drops 0.95 → 0.73 full-rank). Ground truth: exact blocked brute
force over the same array. Reported per ef:
recall@10 against exact, single-thread kernel QPS, and the candidate-budget
fraction ef/N (the O(√N·d + spill·ef·d) sublinearity claim is visible as
QPS falling far slower than 1/ef while recall climbs).

    python tools/large_shard_bench.py [N] [> report.json]

Prints one JSON line; BENCH.md records the curated result.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gp_ann_spark.operators.ivf_shard import build_ivf, ivf_search  # noqa: E402

D = 64
N_CLUSTERS = 64
N_QUERIES = 200
K = 10
# budgets scale with √n (the kernel probes whole cells of ~√n primary
# members, so sub-cell efs collapse onto the 1-cell operating point); the
# absolute ef values are reported alongside
EF_SWEEP_REL = (0.125, 0.25, 0.5, 1.0, 2.0, 4.0)
SEED = 555


def make_shard(n: int, seed: int = SEED) -> np.ndarray:
    """Seeded Gaussian mixture, generated in blocks to bound peak memory."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 4.0, size=(N_CLUSTERS, D))
    intrinsic = 8
    factors = rng.normal(0, 1.0, size=(N_CLUSTERS, D, intrinsic))
    out = np.empty((n, D), dtype=np.float32)
    blk = 1 << 19
    for lo in range(0, n, blk):
        m = min(blk, n - lo)
        comp = rng.integers(0, N_CLUSTERS, size=m)
        z = rng.normal(0, 1.0, size=(m, intrinsic))
        low_rank = np.einsum("mdi,mi->md", factors[comp], z)
        out[lo : lo + m] = (
            centers[comp] + low_rank + rng.normal(0, 0.05, size=(m, D))
        ).astype(np.float32)
    return out


def exact_gt(X: np.ndarray, Q: np.ndarray, k: int) -> np.ndarray:
    """Blocked brute-force top-k ids (stable (dist, position) order, the
    kernel's own tie-break)."""
    Xd = X.astype(np.float64)
    Qd = Q.astype(np.float64)
    x_sq = (Xd * Xd).sum(1)
    ids = np.empty((len(Q), k), dtype=np.int64)
    blk = max(1, (256 << 20) // (8 * len(X)))
    pos = np.arange(len(X))
    for lo in range(0, len(Q), blk):
        Qb = Qd[lo : lo + blk]
        d2 = (Qb * Qb).sum(1)[:, None] + x_sq[None, :] - 2.0 * (Qb @ Xd.T)
        np.maximum(d2, 0.0, out=d2)
        srt = np.lexsort((np.broadcast_to(pos, d2.shape), d2), axis=-1)[:, :k]
        ids[lo : lo + blk] = srt
    return ids


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    X = make_shard(n)
    rng = np.random.default_rng(SEED + 1)
    # queries = perturbed base points (in-distribution, like the reference's
    # public query files)
    qi = rng.choice(n, size=N_QUERIES, replace=False)
    Q = X[qi] + rng.normal(0, 0.2, size=(N_QUERIES, D)).astype(np.float32)

    t0 = time.time()
    gt = exact_gt(X, Q, K)
    t_gt = time.time() - t0

    t0 = time.time()
    index = build_ivf(X, seed=SEED)
    t_build = time.time() - t0
    n_cells = len(index[0])

    root = int(np.ceil(np.sqrt(n)))
    ivf_search(Q[:8], X, index, k=K, ef=root)  # warm the kernel (page-in + BLAS)
    sweep = {}
    for rel in EF_SWEEP_REL:
        ef = max(K, int(rel * root))
        t0 = time.time()
        idx, _ = ivf_search(Q, X, index, k=K, ef=ef)
        dt = time.time() - t0
        hits = sum(len(np.intersect1d(a, g)) for a, g in zip(idx, gt))
        sweep[ef] = {
            "recall@10": round(hits / (N_QUERIES * K), 4),
            "qps": round(N_QUERIES / dt, 1),
            "ef_over_n": round(ef / n, 6),
        }

    print(
        json.dumps(
            {
                "metric": "large_shard_ivf",
                "n_points": n,
                "dim": D,
                "n_cells": n_cells,
                "n_queries": N_QUERIES,
                "build_sec": round(t_build, 1),
                "exact_gt_sec": round(t_gt, 1),
                "sweep": sweep,
            }
        )
    )


if __name__ == "__main__":
    main()
