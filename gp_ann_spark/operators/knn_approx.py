"""Approximate k-NN graph builder: recursive leader sketching.

Reference: ``ApproximateKNNGraphBuilder`` (``src/knn_graph.h:52-143``, params
:254-265): per repetition, sample leaders (950 at the top level, 0.5% capped
at 1500 below), assign every point to its ``fanout``=3 closest leaders
(duplicating points across buckets — that is what discovers cross-boundary
edges), recurse into buckets larger than ``max_cluster_size``=5000 up to
depth 14, brute-force each final bucket (``CrunchBucket`` :165-185), merge
per-bucket top-k lists across buckets and 3 repetitions with dedup
(:218-235).

Spark-first shape — an iterative DataFrame loop, no driver recursion over
data:

- state is ``(id, vec, bucket)`` where ``bucket`` is a path-encoded id
  (parent_bucket * fanout_limit + leader_rank) — the recursion tree lives in
  a column, bounded by MAX_DEPTH like the reference;
- leaders are a *deterministic seeded sample per bucket* (smallest
  xxhash64(id, seed, depth) — partition-independent, ≙ the seeded
  std::sample at knn_graph.h:75);
- point→leader assignment is one cogrouped ``applyInPandas`` per bucket
  (blocked BLAS, top-``fanout`` per point);
- finished buckets flow straight into the per-bucket brute-force stage —
  only oversized buckets iterate again;
- candidates from all buckets and repetitions union, then one
  ``merge_topk`` (groupBy + window) deduplicates — lock-free vs the
  reference's spinlocked merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gp_ann_spark.functions.distances import distance_matrix
from gp_ann_spark.checkpoint import realias as _realias
from gp_ann_spark.checkpoint import release_local_checkpoint, swap_checkpoint
from gp_ann_spark.operators.knn import merge_topk, symmetrize

# Reference hyperparameters (knn_graph.h:254-265)
TOP_LEVEL_LEADERS = 950
LEADER_FRACTION = 0.005
MAX_LEADERS = 1500
FANOUT = 3  # top level ONLY; recursion uses fanout=1 (knn_graph.h:133) —
# total duplication is 3×n per repetition, not 3^depth
MAX_CLUSTER_SIZE = 5000
MIN_CLUSTER_SIZE = 50
MAX_MERGED_CLUSTER_SIZE = 2500
MAX_DEPTH = 14
REPETITIONS = 3
SEED = 555


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over an int64/uint64 array (wrapping math)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x.astype(np.int64)


def _assign_to_leaders(
    pts: DataFrame, leaders: DataFrame, fanout: int, metric: str,
) -> DataFrame:
    """Within each bucket, assign every point to its top-``fanout`` closest
    leaders; new bucket = splitmix64(old·φ + leader_rank + 1) — a HASH path
    encoding instead of positional (old·MAX_LEADERS + rank), so bucket ids
    never need a per-level global renumbering (the round-1 densify pass cost
    ~6 driver jobs per level per repetition). A 64-bit collision merges two
    buckets — harmless in an approximate builder: distances are exact inside
    the merged bucket and the oversize guard re-splits it.
    Cogrouped applyInPandas: one dense (m×d)@(L×d) BLAS per bucket
    (≙ ClosestLeaders defs.cpp:87-96 at bucket granularity)."""

    def assign(pts_pdf: pd.DataFrame, lead_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pts_pdf) == 0:
            return pd.DataFrame({"id": [], "bucket": []}).astype({"id": "int64", "bucket": "int64"})
        if len(lead_pdf) == 0:  # no leaders sampled (tiny bucket) — keep as-is
            return pd.DataFrame({"id": pts_pdf["id"], "bucket": pts_pdf["bucket"]})
        X = np.stack(pts_pdf["vec"].to_numpy()).astype(np.float64)
        L = np.stack(lead_pdf["vec"].to_numpy()).astype(np.float64)
        ranks = lead_pdf["leader_rank"].to_numpy()
        d = distance_matrix(X, L, metric)
        f = min(fanout, d.shape[1])
        if f < d.shape[1]:
            # canonical (distance, leader_rank) selection: a bare argpartition
            # picks shuffle-arrival order among leaders tied at the fanout
            # boundary (duplicate leader vectors are legal), which made two
            # independent builds route the point to different buckets
            idx = np.lexsort((np.broadcast_to(ranks, d.shape), d), axis=-1)[:, :f]
        else:
            idx = np.tile(np.arange(d.shape[1]), (len(X), 1))
        base = pts_pdf["bucket"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        child = np.repeat(base, idx.shape[1]) + (ranks[idx.ravel()].astype(np.uint64) + np.uint64(1))
        return pd.DataFrame(
            {
                "id": np.repeat(pts_pdf["id"].to_numpy(), idx.shape[1]),
                "bucket": _mix64(child),
            }
        )

    return pts.groupBy("bucket").cogroup(leaders.groupBy("bucket")).applyInPandas(
        assign, schema="id long, bucket long"
    )


def _bucket_bruteforce(bucketed: DataFrame, k: int, metric: str) -> DataFrame:
    """All-pairs k-NN inside each bucket (≙ CrunchBucket knn_graph.h:165-185):
    one applyInPandas per bucket, dense m×m BLAS, local top-k."""

    def crunch(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"src": [], "dst": [], "weight": []}).astype(
                {"src": "int64", "dst": "int64", "weight": "float64"}
            )
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        d = distance_matrix(X, X, metric)
        # a point can occur twice in a merged bucket (fanout duplication) —
        # mask every equal-id pair, not just the diagonal
        d[ids[:, None] == ids[None, :]] = np.inf
        kk = min(k, m - 1)
        # keep EVERY candidate tied at the k-th distance (d <= kth), not an
        # arbitrary argpartition pick: the mask is a pure function of the
        # distance content, so the bucket's output no longer depends on the
        # row order the shuffle delivered (same fix as knn._topk_within_block
        # — the downstream total-order merge_topk trims the tie extras)
        kth = np.partition(d, kk - 1, axis=1)[:, kk - 1]
        r, c = np.nonzero(d <= kth[:, None])
        w = d[r, c]
        keep = np.isfinite(w)  # drop masked equal-id pairs
        return pd.DataFrame({"src": ids[r][keep], "dst": ids[c][keep], "weight": w[keep]})

    return bucketed.groupBy("bucket").applyInPandas(crunch, schema="src long, dst long, weight double")


def _merge_small_buckets(
    pts: DataFrame, min_size: int = MIN_CLUSTER_SIZE, max_merged: int = MAX_MERGED_CLUSTER_SIZE,
) -> DataFrame:
    """Merge buckets smaller than ``min_size`` into batches ≤ ``max_merged``
    (≙ knn_graph.h:100-112 — avoids isolated nodes at the cost of a few long
    range candidate edges). The greedy packing needs a *global* cumulative
    sum over the bucket-size table (O(n/min_size) rows at scale), done as
    range-partitioned local cumsums + driver-broadcast partition offsets —
    no single-partition global window.
    """
    spark = pts.sparkSession
    # non-eager: the limit(1).count() probe is the materializing action
    sizes = pts.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    small = sizes.where(F.col("n") < min_size)
    if small.limit(1).count() == 0:
        release_local_checkpoint(sizes)
        return pts
    nparts = max(spark.sparkContext.defaultParallelism, 1)
    # one materialization (at the collect below) so the offsets pass and the
    # cumsum pass see the same (range-sampled) partition layout
    parted = (
        small.repartitionByRange(nparts, "bucket")
        .sortWithinPartitions("bucket")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    per_part = sorted(
        (int(r["_pid"]), int(r["s"]))
        for r in parted.groupBy("_pid").agg(F.sum("n").alias("s")).collect()
    )
    offs, acc = [], 0
    for pid, s_ in per_part:
        offs.append((pid, acc))
        acc += s_
    off_df = F.broadcast(spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long"))
    w_local = Window.partitionBy("_pid").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    merged_map = (
        parted.withColumn("_cum", F.sum("n").over(w_local))
        .join(off_df, "_pid")
        .withColumn("_merged", -(F.floor((F.col("_off") + F.col("_cum")) / max_merged) + 1))
        .select("bucket", "_merged")
        .localCheckpoint(eager=True)
    )
    release_local_checkpoint(parted)
    release_local_checkpoint(sizes)
    return (
        pts.join(F.broadcast(merged_map), "bucket", "left")
        .select("id", "vec", F.coalesce("_merged", F.col("bucket")).alias("bucket"))
    )


def _force_split_big_buckets(pts: DataFrame, max_cluster_size: int, seed: int) -> DataFrame:
    """Random-split any bucket still above ``max_cluster_size`` after the
    depth-capped recursion (≙ the near-duplicate base case
    knn_graph.h:120-131: such buckets are (near-)duplicate clusters that
    leader sampling cannot shrink; a seeded hash split bounds the
    brute-force cost at the price of a few split-crossing edges)."""
    # non-eager: the limit(1).count() probe is the materializing action
    sizes = pts.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    big = sizes.where(F.col("n") > max_cluster_size)
    if big.limit(1).count() == 0:
        release_local_checkpoint(sizes)
        return pts
    splits = big.select("bucket", F.ceil(F.col("n") / max_cluster_size).cast("long").alias("_ns"))
    out = (
        pts.join(F.broadcast(splits), "bucket", "left")
        .select(
            "id",
            "vec",
            F.when(
                F.col("_ns").isNotNull(),
                # hash-namespace the split children (bucket ids are already
                # mixed hashes — positional offsets would overflow int64)
                F.xxhash64(
                    "bucket", F.lit(seed), F.lit("split"),
                    F.pmod(F.xxhash64("id", F.lit(seed), F.lit("split")), F.col("_ns")),
                ),
            ).otherwise(F.col("bucket")).alias("bucket"),
        )
    )
    # NOTE: sizes stays checkpointed — `out` is lazy and still reads the
    # broadcast splits derived from it; it is tiny (one row per bucket).
    return out


def build_knn_graph(
    points: DataFrame,
    k: int = 10,
    metric: str = "l2",
    repetitions: int = REPETITIONS,
    fanout: int = FANOUT,
    max_cluster_size: int = MAX_CLUSTER_SIZE,
    top_level_leaders: int = TOP_LEVEL_LEADERS,
    max_depth: int = MAX_DEPTH,
    seed: int = SEED,
    symmetric: bool = False,
) -> DataFrame:
    """Approximate k-NN edge table (src, dst, weight).

    ≙ BuildApproximateNearestNeighborGraph (knn_graph.h:145-162): union of
    ``repetitions`` recursive sketches, merged + deduped to per-src top-k.
    """
    pts0 = points.select("id", "vec").withColumn("bucket", F.lit(0).cast("long"))
    # ONE shared materialization of the bucket-0 state — the repetitions all
    # start from the identical frame, so checkpointing it per repetition was
    # repetitions-1 redundant jobs. The first swap inside a repetition must
    # NOT release it (other repetitions still read it) — see `prev` below.
    pts_base = pts0.localCheckpoint(eager=True)

    def one_repetition(rep: int) -> DataFrame:
        pts = pts_base
        for depth in range(max_depth):
            # localCheckpoint the (tiny) size table: breaks the self-join
            # lineage between pts and its own aggregate. Non-eager — the
            # count() is the materializing action, one job instead of two.
            sizes = pts.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
            big = sizes.where(F.col("n") > max_cluster_size)
            n_big = big.count()
            if n_big == 0:
                release_local_checkpoint(sizes)  # break path must release too
                break
            big_pts = pts.join(big.select("bucket"), "bucket", "left_semi")
            done_pts = pts.join(big.select("bucket"), "bucket", "left_anti")
            # deterministic per-bucket leader sample: smallest hashes win
            n_leaders_expr = (
                F.when(F.lit(depth) == 0, F.lit(top_level_leaders))
                .otherwise(F.least(F.lit(MAX_LEADERS), F.greatest(F.lit(2), (F.col("n") * LEADER_FRACTION).cast("int"))))
            )
            big_sized = big.withColumn("n_leaders", n_leaders_expr).select("bucket", "n", "n_leaders")
            w = Window.partitionBy("bucket").orderBy("_h")
            # "n_leaders smallest hashes win" — but ranking the bucket's full
            # membership funnels it through ONE window-sort task (at depth 0
            # the bucket is the whole corpus: the exact scale-killer
            # functions/windows.py warns about). Pre-filter to a hash PREFIX
            # first: keep hashes below the ~(4·n_leaders+64)/n quantile of the
            # uniform int64 hash space, a distributed filter leaving ~4× the
            # needed rows, then rank only survivors. The filter is a prefix of
            # the ranking order, so the selected leaders are identical to the
            # unfiltered version whenever ≥ n_leaders rows survive (mean 4×
            # margin; Chernoff-negligible otherwise, and a short bucket just
            # yields fewer leaders — the oversize guard re-splits it).
            p_keep = (4.0 * F.col("n_leaders") + 64.0) / F.col("n")
            h_thr = F.least(
                F.lit(-9.223372036854776e18) + p_keep * F.lit(1.8446744073709552e19),
                F.lit(9.223372036854e18),
            ).cast("long")
            leaders = (
                big_pts.join(F.broadcast(big_sized), "bucket")
                .withColumn("_h", F.xxhash64("id", F.lit(seed + rep), F.lit(depth)))
                .where((F.col("n") <= 4 * F.col("n_leaders") + 64) | (F.col("_h") < h_thr))
                .withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") <= F.col("n_leaders"))
                .select("bucket", "id", "vec", (F.col("_r") - 1).cast("long").alias("leader_rank"))
                # leaders derive from big_pts; cogrouping the two without a
                # lineage break trips the ambiguous-self-join check. The
                # NON-eager checkpoint breaks lineage identically (the plan
                # becomes a LogicalRDD either way) but defers materialization
                # to the swap_checkpoint job below — one driver job per
                # depth instead of two.
                .localCheckpoint(eager=False)
            )
            # fanout>1 only on the first split (knn_graph.h:133 recurses with
            # fanout=1): duplication is bounded at fanout×n per repetition.
            level_fanout = fanout if depth == 0 else 1
            reassigned = _assign_to_leaders(big_pts, _realias(leaders), level_fanout, metric)
            new_pts = reassigned.join(points.select("id", "vec"), "id").select("id", "vec", "bucket")
            # hash path encoding (see _assign_to_leaders): done buckets keep
            # their ids, split buckets get mixed-hash children — no per-level
            # renumbering pass, no global window, no id overflow.
            merged = done_pts.unionByName(new_pts)
            pts = swap_checkpoint(merged, pts if pts is not pts_base else None)
            for aux in (sizes, leaders):
                release_local_checkpoint(aux)
        pts = _force_split_big_buckets(pts, max_cluster_size, seed + rep)
        pts = _merge_small_buckets(pts).dropDuplicates(["bucket", "id"])
        return _bucket_bruteforce(pts.select("bucket", "id", "vec"), k, metric)

    # repetitions are fully independent — run their driver loops on threads
    # so the per-level jobs of different reps overlap (Spark schedules
    # concurrent jobs onto the shared task slots; the loop is latency-bound
    # on small per-job work, so overlap ≈ repetitions× wall-clock win)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(repetitions, 4)) as ex:
        all_candidates = list(ex.map(one_repetition, range(repetitions)))

    cand = all_candidates[0]
    for c in all_candidates[1:]:
        cand = cand.unionByName(c)
    edges = merge_topk(cand, k)
    return symmetrize(edges) if symmetric else edges


SIZE_QUANTILES = (0.0, 0.01, 0.05, 0.1, 0.15, 0.5, 0.85, 0.9, 0.95, 0.99, 1.0)


def bucket_size_stats(bucketed: DataFrame) -> DataFrame:
    """Bucket-size distribution diagnostic (≙ the BruteForceBuckets stats,
    knn_graph.h:191-208): count, mean, and the reference's quantile grid over
    the per-bucket sizes. One row; the size table is one groupBy."""
    sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    qs = ",".join(str(q) for q in SIZE_QUANTILES)
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.avg("n").alias("avg_size"),
        F.expr(f"percentile(n, array({qs}))").alias("quantiles"),
    )


def graph_recall(approx_edges: DataFrame, exact_edges: DataFrame) -> float:
    """Fraction of exact k-NN edges recovered by the approximate graph
    (≙ GraphRecall graph_quality_benchmark.cpp:53-66): |A ∩ E| / |E|."""
    n_exact = exact_edges.count()
    if n_exact == 0:
        return 1.0  # vacuous: no exact edges to recover (0/1-point corpus)
    inter = approx_edges.select("src", "dst").join(exact_edges.select("src", "dst"), ["src", "dst"], "left_semi").count()
    return inter / n_exact
