"""K-means family: Lloyd's, balanced (BKM+-style), capacity-aware variants.

Reference: ``src/kmeans.cpp`` — ``KMeans`` (:228-244, 20 Lloyd rounds, seed
555), ``NearestCenters`` assign (:12-27), ``AggregateClustersParallel``
(:151-204 — partial/final aggregation, whose comment notes "This is what a
distributed implementation would do"; here it literally is), empty-cluster
removal (:29-50), ``BalancedKMeans`` BKM+ (:253-524, penalty schedule
1.5009−0.0009·round at :295-301, final greedy re-migration :494-515).

Spark-first shape per Lloyd superstep:

1. centroids (k×d, a few KB–MB) are **broadcast** to every task;
2. one ``mapInPandas`` pass over point blocks does the assign (BLAS argmin)
   AND emits per-block partial centroid sums — the map-side combine;
3. one small ``groupBy(shard)`` final-aggregates k rows.

So each superstep shuffles O(k·n_blocks) tiny rows, never the points.
The point table itself is read repeatedly — cache() it before calling.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gp_ann_spark.checkpoint import release_local_checkpoint, swap_checkpoint
from gp_ann_spark.functions.distances import distance_matrix

SEED = 555  # the reference's algorithm seed (kmeans.cpp:19 via partition.cpp:14)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) if len(pdf) else np.zeros((0, 1))
    return ids, vecs


def seeded_sample_centroids(points: DataFrame, k: int, seed: int = SEED) -> np.ndarray:
    """Deterministic k-row sample: the k smallest xxhash64(id, seed) — a
    seeded 'random' draw that is partition-independent and needs no global
    sort (TakeOrderedAndProject). ≙ random_choice init kmeans.cpp:19."""
    sample = (
        points.withColumn("_h", F.xxhash64("id", F.lit(seed)))
        .orderBy("_h")
        .limit(k)
        .select("vec")
        .toPandas()
    )
    return np.stack(sample["vec"].to_numpy()).astype(np.float64)


def _superstep(
    points: DataFrame, centroids: np.ndarray, metric: str, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray, float]:
    """One Lloyd superstep: returns (new_centroids, sizes, objective).

    mapInPandas emits per-block (shard, count, sum_0..sum_{d-1}, obj) partial
    rows; Catalyst final-aggregates them (partial+final HashAggregate ≙
    AggregateClustersParallel kmeans.cpp:151-204).
    """
    spark = points.sparkSession
    k, d = centroids.shape
    bc = spark.sparkContext.broadcast(centroids)
    schema = "shard int, cnt long, obj double, sums array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dists = distance_matrix(X, C, metric)
            a = dists.argmin(axis=1)
            obj = dists[np.arange(len(X)), a]
            sums = np.zeros((k, d))
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=k)
            objs = np.bincount(a, weights=obj, minlength=k)
            nz = cnt > 0
            yield pd.DataFrame(
                {
                    "shard": np.arange(k)[nz],
                    "cnt": cnt[nz],
                    "obj": objs[nz],
                    "sums": list(sums[nz]),
                }
            )

    agg = (
        points.select(vec_col)
        .mapInPandas(partial, schema=schema)
        .groupBy("shard")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("obj").alias("obj"),
            *[F.sum(F.col("sums")[i]).alias(f"s{i}") for i in range(d)],
        )
        .toPandas()
    )
    new_c = centroids.copy()
    sizes = np.zeros(k, dtype=np.int64)
    total_obj = float(agg["obj"].sum()) if len(agg) else 0.0
    for _, row in agg.iterrows():
        s = int(row["shard"])
        sizes[s] = int(row["cnt"])
        new_c[s] = np.array([row[f"s{i}"] for i in range(d)]) / row["cnt"]
    return new_c, sizes, total_obj


def assign_to_centroids(
    points: DataFrame, centroids: np.ndarray, metric: str = "l2",
    id_col: str = "id", vec_col: str = "vec", with_dist: bool = False,
) -> DataFrame:
    """Broadcast nearest-center assignment (≙ NearestCenters kmeans.cpp:12-27,
    the 'assign' half of Lloyd): mapInPandas blocked argmin, no shuffle at
    all — output stays co-partitioned with the points."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    schema = f"{id_col} long, shard int" + (", dist double" if with_dist else "")

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dists = distance_matrix(X, C, metric)
            a = dists.argmin(axis=1)
            out = {id_col: pdf[id_col].to_numpy(), "shard": a.astype(np.int32)}
            if with_dist:
                out["dist"] = dists[np.arange(len(X)), a]
            yield pd.DataFrame(out)

    return points.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def lloyd(
    points: DataFrame,
    k: int,
    n_iter: int = 20,
    metric: str = "l2",
    seed: int = SEED,
    id_col: str = "id",
    vec_col: str = "vec",
) -> tuple[np.ndarray, DataFrame]:
    """Lloyd's k-means, fixed iteration count (≙ KMeans kmeans.cpp:228-244:
    20 rounds, no early exit). Returns (centroids, assignment DF).

    Empty clusters are dropped and ids densified at the end
    (≙ RemoveEmptyClusters/RemapPartitionIDs kmeans.cpp:29-50).
    """
    centroids = seeded_sample_centroids(points.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), k, seed)
    sizes = None
    for _ in range(n_iter):
        centroids, sizes, _ = _superstep(points, centroids, metric, id_col, vec_col)
    if sizes is not None and (sizes == 0).any():
        keep = sizes > 0
        centroids = centroids[keep]
    assignment = assign_to_centroids(points, centroids, metric, id_col, vec_col)
    return centroids, assignment


def capacity_fill(
    scored: DataFrame,
    capacity: "int | DataFrame",
    id_col: str = "id",
    shard_col: str = "shard",
    score_col: str = "dist",
    prefer_col: str | None = None,
) -> DataFrame:
    """Greedy capacity-constrained assignment as a window program.

    Input: candidate (id, shard, score) ratings, possibly several shards per
    id. Semantics ≙ the reference's global-rating greedy fills
    (overlapping_partitioning.cpp:205-222, partitioning.cpp:336-346):
    process candidates in ascending score; a candidate lands iff its shard
    still has room *among better-scored candidates* and the id is not yet
    placed. Two windows, no driver loop:

      fill_rank  = row_number over (shard, order by score)   — capacity gate
      choice_rnk = row_number over (id, order by score)      — best surviving

    A single pass can strand an id (its slots consumed by ids that landed
    elsewhere), so the pass is looped over the unplaced remainder with the
    leftover capacities — the relational form of the reference's retry loop
    (partitioning.cpp:336-346) — until a fixpoint.
    """
    order = [F.col(score_col).asc()] + ([F.col(prefer_col).asc()] if prefer_col else []) + [F.col(id_col).asc()]
    w_shard = Window.partitionBy(shard_col).orderBy(*order)
    w_id = Window.partitionBy(id_col).orderBy(*order)

    if isinstance(capacity, DataFrame):
        caps = capacity.select(shard_col, F.col("cap").cast("long"))
    else:
        caps = (
            scored.select(shard_col).distinct().withColumn("cap", F.lit(int(capacity)).cast("long"))
        )
    caps = caps.localCheckpoint(eager=True)
    remaining = scored
    placed: DataFrame | None = None
    for _ in range(20):
        ranked = remaining.withColumn("_fill", F.row_number().over(w_shard))
        gated = ranked.join(F.broadcast(caps), shard_col).where(F.col("_fill") <= F.col("cap")).drop("cap")
        chosen = (
            gated.withColumn("_choice", F.row_number().over(w_id))
            .where(F.col("_choice") == 1)
            .drop("_fill", "_choice")
            .localCheckpoint(eager=True)
        )
        n_new = chosen.count()
        if n_new == 0:
            break
        placed = chosen if placed is None else placed.unionByName(chosen)
        remaining = swap_checkpoint(remaining.join(chosen.select(id_col), id_col, "left_anti"), remaining if _ > 0 else None)
        if remaining.limit(1).count() == 0:
            break
        used = chosen.groupBy(shard_col).agg(F.count(F.lit(1)).alias("_u"))
        caps = swap_checkpoint(
            caps.join(used, shard_col, "left")
            .select(shard_col, (F.col("cap") - F.coalesce("_u", F.lit(0))).alias("cap"))
            .where(F.col("cap") > 0),
            caps,
        )
        if caps.limit(1).count() == 0:
            break
    if placed is None:
        return scored.limit(0)
    return placed


def balanced_lloyd(
    points: DataFrame,
    k: int,
    max_cluster_size: int,
    n_iter: int = 20,
    metric: str = "l2",
    seed: int = SEED,
    rebalance_rounds: int = 8,
) -> tuple[np.ndarray, DataFrame]:
    """Balanced k-means: Lloyd supersteps with a size penalty, then hard
    capacity enforcement by greedy re-migration.

    ≙ BalancedKMeans (kmeans.cpp:253-524). The reference runs 1000
    sequential mini-batch sub-rounds per round with per-sub-round centroid
    updates; that is inherently serial, so we batch to supersteps (SURVEY §7)
    — its *final* greedy re-migration of overflow points (kmeans.cpp:494-515)
    is what actually pins the invariant ``max shard ≤ max_cluster_size``,
    and that step we reproduce exactly (iterated capacity_fill).
    """
    n = points.count()
    centroids, _ = lloyd(points, k, n_iter=n_iter, metric=metric, seed=seed)
    k_eff = len(centroids)
    assignment = assign_to_centroids(points, centroids, metric, with_dist=True)
    assignment = assignment.localCheckpoint(eager=True)

    for _ in range(rebalance_rounds):
        sizes = {r["shard"]: r["cnt"] for r in assignment.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        over = [s for s, c in sizes.items() if c > max_cluster_size]
        if not over:
            break
        # Within each overfull shard keep the max_cluster_size closest points
        # (≙ kmeans.cpp:494-515 keeps best-fitting, migrates the rest).
        w = Window.partitionBy("shard").orderBy(F.col("dist").asc(), F.col("id").asc())
        ranked = assignment.withColumn("_r", F.row_number().over(w))
        keep = ranked.where(~F.col("shard").isin(over) | (F.col("_r") <= max_cluster_size)).drop("_r")
        spill_ids = ranked.where(F.col("shard").isin(over) & (F.col("_r") > max_cluster_size)).select("id")
        spill_pts = points.join(spill_ids, "id", "left_semi")
        # Rate spilled points against all non-full shards, greedy fill.
        room = {s: max_cluster_size - int(c) for s, c in sizes.items() if c < max_cluster_size}
        if not room:
            break
        open_shards = sorted(room)
        sub_c = centroids[open_shards]
        rated = assign_all_candidates(spill_pts, sub_c, metric)
        rated = rated.withColumn(
            "shard", F.element_at(F.array(*[F.lit(s) for s in open_shards]), F.col("cand") + 1)
        ).drop("cand")
        caps = points.sparkSession.createDataFrame(
            [(int(s), int(c)) for s, c in room.items()], "shard int, cap int"
        )
        placed = capacity_fill(rated, caps)
        assignment = swap_checkpoint(
            keep.select("id", "shard", "dist").unionByName(placed.select("id", "shard", "dist")), assignment
        )

    return centroids[:k_eff], assignment.select("id", "shard")


def assign_all_candidates(
    points: DataFrame, centroids: np.ndarray, metric: str = "l2", top_f: int | None = None,
) -> DataFrame:
    """Rate each point against every centroid (or its top_f closest):
    (id, cand, dist) rows. Broadcast NL theta-join ≙ ClosestLeaders
    defs.cpp:87-96."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def rate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        f = top_f or len(C)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            dists = distance_matrix(X, C, metric)
            if f < dists.shape[1]:
                idx = np.argpartition(dists, f - 1, axis=1)[:, :f]
            else:
                idx = np.tile(np.arange(dists.shape[1]), (len(X), 1))
            ids = np.repeat(pdf["id"].to_numpy(), idx.shape[1])
            yield pd.DataFrame(
                {
                    "id": ids,
                    "cand": idx.ravel().astype(np.int32),
                    "dist": np.take_along_axis(dists, idx, axis=1).ravel(),
                }
            )

    return points.select("id", "vec").mapInPandas(rate, schema="id long, cand int, dist double")
