"""Sublinear in-shard ANN kernel: a two-level IVF built per shard, in-task.

≙ ``src/inverted_index_hnsw.h:10-78`` — the reference needs a sublinear
per-shard index because exact in-shard scans cannot hit QPS targets at
25M-point shards; it uses hnswlib with per-shard seed 555+b
(``shard_searches.cpp:38-44``: shuffled insert, seq prefix then parallel)
and sweeps ``ef_search`` ∈ {50..500} (:13). The Spark-idiomatic analog is a
NumPy IVF built inside the same ``applyInPandas`` task that already holds
the shard's points:

- **build**: mini k-means to ``⌈√n⌉`` cells (seeded 555+shard like the
  reference's per-shard HNSW seed), members CSR-packed by cell — O(n·√n·d)
  once per task, no graph construction, fully BLAS;
- **query**: rank cells by centroid distance, take cells until the
  candidate budget ``ef`` is covered, brute-force only those members —
  O(√n·d + ef·d) per query instead of O(n·d). ``ef`` has the same
  semantics as HNSW's dynamic-list size: the number of candidate points
  examined, so the reference's ef_search sweep maps 1:1.

The kernel is exact once ef ≥ shard size (every cell probed), which anchors
its recall to the existing exact in-shard oracle (search.probe_shards).
"""

from __future__ import annotations

import numpy as np

from gp_ann_spark.functions.distances import distance_matrix, pairwise_sqr_l2

# the reference's ef_search sweep (shard_searches.cpp:13)
EF_SWEEP = (50, 80, 100, 150, 200, 250, 300, 400, 500)


def _blocked_argmin(X: np.ndarray, C: np.ndarray, budget_bytes: int = 64 << 20) -> np.ndarray:
    """argmin over pairwise_sqr_l2(X, C) without materializing the full
    n×c matrix — blocks of X sized so each block×c float64 matrix stays
    ≤ ``budget_bytes`` (an unblocked n×c at a 25M-point shard with √n cells
    would be ~1 TB)."""
    c = len(C)
    block = max(1, budget_bytes // (8 * max(c, 1)))
    out = np.empty(len(X), dtype=np.int64)
    for lo in range(0, len(X), block):
        out[lo : lo + block] = pairwise_sqr_l2(X[lo : lo + block], C).argmin(1)
    return out


def build_ivf(X: np.ndarray, seed: int, n_cells: int | None = None, n_iter: int = 3):
    """Cluster the shard's points into ``n_cells`` (default ⌈√n⌉) cells.

    Returns ``(C, order, starts, ends)``: cell centroids, point indices
    CSR-packed by cell (``order[starts[c]:ends[c]]`` = members of cell c).
    Seeded sampling ≙ the reference's per-shard random_seed 555+b. All
    assignments are block-bounded (~64 MB per distance block) so the build
    holds at 10⁷-point shards.
    """
    n = len(X)
    c = min(n, n_cells or max(1, int(np.ceil(np.sqrt(n)))))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(n, size=c, replace=False)].astype(np.float64).copy()
    for _ in range(n_iter):
        a = _blocked_argmin(X, C)
        # vectorized mean update: sum per cell / count per cell
        counts = np.bincount(a, minlength=c).astype(np.float64)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    a = _blocked_argmin(X, C)
    order = np.argsort(a, kind="stable")
    sorted_a = a[order]
    starts = np.searchsorted(sorted_a, np.arange(c))
    ends = np.searchsorted(sorted_a, np.arange(c) + 1)
    return C, order, starts, ends


def ivf_search(
    Q: np.ndarray,
    X: np.ndarray,
    index,
    k: int,
    ef: int,
    metric: str = "l2",
):
    """Top-k per query under candidate budget ``ef``.

    Returns ``(idx, dist)`` arrays of shape (nq, ≤k): positions into X and
    their distances, each row sorted ascending with stable (dist, position)
    order — the same tie-break the exact path uses.
    """
    C, order, starts, ends = index
    sizes = ends - starts
    # process query blocks END-TO-END (rank + probe inside the block loop):
    # only one block×cells matrix is ever resident, so memory stays ~64 MB
    # regardless of how many queries probe this shard in one task
    q_block = max(1, (64 << 20) // (8 * max(len(C), 1)))
    out_idx = []
    out_dist = []
    for lo in range(0, len(Q), q_block):
        d_qc = distance_matrix(Q[lo : lo + q_block], C, metric)
        cell_rank = np.argsort(d_qc, axis=1, kind="stable")
        for bi in range(len(cell_rank)):
            qi = lo + bi
            co = cell_rank[bi]
            csum = np.cumsum(sizes[co])
            # probe cells until the budget is covered (≥ ef candidates seen)
            n_cells_q = min(len(co), int(np.searchsorted(csum, ef) + 1))
            cand = np.concatenate([order[starts[cc] : ends[cc]] for cc in co[:n_cells_q]])
            d = distance_matrix(Q[qi : qi + 1], X[cand], metric)[0]
            kk = min(k, len(cand))
            part = np.argpartition(d, kk - 1)[:kk] if kk < len(d) else np.arange(len(d))
            # stable sort by (dist, original position) like the exact kernel
            srt = np.lexsort((cand[part], d[part]))
            out_idx.append(cand[part][srt])
            out_dist.append(d[part][srt])
    return out_idx, out_dist
