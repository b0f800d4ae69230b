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
from gp_ann_spark.functions.distances import distance_matrix, pos_distance_matrix

SEED = 555  # the reference's algorithm seed (kmeans.cpp:19 via partition.cpp:14)


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

    ``metric="mips"`` uses the reference's spherical update
    (SumPointsInClustersIP/NormalizeCentroidsIP kmeans.cpp:72-100): members
    are summed with weight 1/‖p‖, then the centroid is rescaled so its
    squared norm equals the mean member squared norm.
    """
    spark = points.sparkSession
    k, d = centroids.shape
    bc = spark.sparkContext.broadcast(centroids)
    mips = metric == "mips"
    schema = "shard int, cnt long, obj double, norm_sq double, sums array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dists = distance_matrix(X, C, metric)
            a = dists.argmin(axis=1)
            obj = dists[np.arange(len(X)), a]
            if mips:
                # ≙ SumPointsInClustersIP: weight 1/‖p‖ per point, track Σ‖p‖²
                norms = np.sqrt((X * X).sum(axis=1))
                safe = np.where(norms == 0.0, 1.0, norms)
                Xw = X / safe[:, None]
                nsq = norms * norms
            else:
                Xw = X
                nsq = np.zeros(len(X))
            sums = np.zeros((k, d))
            np.add.at(sums, a, Xw)
            cnt = np.bincount(a, minlength=k)
            objs = np.bincount(a, weights=obj, minlength=k)
            nsqs = np.bincount(a, weights=nsq, minlength=k)
            nz = cnt > 0
            yield pd.DataFrame(
                {
                    "shard": np.arange(k)[nz],
                    "cnt": cnt[nz],
                    "obj": objs[nz],
                    "norm_sq": nsqs[nz],
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
            F.sum("norm_sq").alias("norm_sq"),
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
        vec = np.array([row[f"s{i}"] for i in range(d)])
        if mips:
            # ≙ NormalizeCentroidsIP kmeans.cpp:72-86: rescale the raw sum so
            # ‖C‖² = mean member ‖p‖² (vec_norm is the squared norm).
            desired = float(row["norm_sq"]) / row["cnt"]
            current = float((vec * vec).sum())
            new_c[s] = vec * np.sqrt(desired / current) if current > 0 else vec
        else:
            new_c[s] = vec / row["cnt"]
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
    drop_empty: bool = True,
) -> tuple[np.ndarray, DataFrame]:
    """Lloyd's k-means, fixed iteration count (≙ KMeans kmeans.cpp:228-244:
    20 rounds, no early exit). Returns (centroids, assignment DF).

    Empty clusters are dropped and ids densified at the end
    (≙ RemoveEmptyClusters/RemapPartitionIDs kmeans.cpp:29-50) unless
    ``drop_empty=False`` — balanced callers keep all k centroids so that
    k·cap ≥ n stays feasible (an empty cluster is just spare capacity).
    """
    centroids = seeded_sample_centroids(points.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), k, seed)
    sizes = None
    for _ in range(n_iter):
        centroids, sizes, _ = _superstep(points, centroids, metric, id_col, vec_col)
    if drop_empty and sizes is not None and (sizes == 0).any():
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
    id. Semantics ≙ the reference's global-rating greedy fill
    (overlapping_partitioning.cpp:205-222, partitioning.cpp:336-346):
    process candidates in ascending (score, prefer, id, shard); a candidate
    lands iff the id is unplaced and its shard still has room — capacity is
    consumed only by actual placements.

    Relational form: Gale–Shapley deferred acceptance with eviction. Each
    pass, every id proposes to its best not-yet-rejected candidate
    (row_number over id); each shard tentatively holds its cap best-scored
    proposers and REJECTS the rest (row_number over proposers per shard) —
    rejected (id, shard) pairs are deleted and the loop repeats until a pass
    rejects nothing, at which point the holds are the placement. Holds are
    tentative: a later re-proposer with a better score evicts a worse hold
    (commit-final variants provably diverge from the greedy). Because both
    sides rank by the same score, preferences are aligned, the stable
    matching is unique, and it equals the sequential greedy's output —
    pinned extensionally by tests/test_properties.py (hypothesis + a
    2000-seed deterministic sweep of the pass structure). Each pass deletes
    ≥1 pair, so the loop terminates; in practice passes ≈ a few × #shards.
    """
    # shard tie-break matters: within one id's candidates the id column is
    # constant, so equal scores across two shards would otherwise be an
    # unordered (nondeterministic) choice
    order = (
        [F.col(score_col).asc()]
        + ([F.col(prefer_col).asc()] if prefer_col else [])
        + [F.col(id_col).asc(), F.col(shard_col).asc()]
    )
    w_shard = Window.partitionBy(shard_col).orderBy(*order)
    w_id = Window.partitionBy(id_col).orderBy(*order)

    if isinstance(capacity, DataFrame):
        caps = capacity.select(shard_col, F.col("cap").cast("long"))
    else:
        caps = (
            scored.select(shard_col).distinct().withColumn("cap", F.lit(int(capacity)).cast("long"))
        )
    caps = caps.where(F.col("cap") > 0).localCheckpoint(eager=True)
    # pairs to dead (cap ≤ 0 / unknown) shards can never place — drop once
    remaining = scored.join(F.broadcast(caps), shard_col, "left_semi").localCheckpoint(eager=True)
    # termination is guaranteed (every continuing pass deletes ≥1 pair), so
    # #passes ≤ #pairs; guard with a generous bound so a logic regression
    # surfaces as a loud failure instead of an apparent hang of O(#pairs)
    # window-shuffle Spark jobs. The bound is computed LAZILY (a count() job
    # only once a run looks suspicious) and raised as RuntimeError — a bare
    # assert would both cost the count up front on every healthy call and
    # vanish under python -O.
    max_passes: int | None = None
    n_pass = 0
    while True:
        n_pass += 1
        if max_passes is None and n_pass > 64:
            # still valid as a bound from HERE: each future pass deletes ≥1
            # of the currently remaining pairs
            max_passes = n_pass + remaining.count() + 1
        if max_passes is not None and n_pass > max_passes:
            raise RuntimeError(
                f"capacity_fill exceeded {max_passes} passes — each pass must "
                "delete at least one candidate pair; this is a regression"
            )
        # propose: each id's best not-yet-rejected candidate
        proposals = (
            remaining.withColumn("_choice", F.row_number().over(w_id))
            .where(F.col("_choice") == 1)
            .drop("_choice")
        )
        # tentative admission: each shard holds its cap best proposers and
        # rejects the rest; rejected pairs are DELETED so the id re-proposes
        # to its next candidate next pass. Holds stay tentative — a better
        # re-proposer evicts a worse hold in a later pass.
        ranked = proposals.withColumn("_fill", F.row_number().over(w_shard)).join(
            F.broadcast(caps), shard_col
        )
        rejected = ranked.where(F.col("_fill") > F.col("cap")).select(id_col, shard_col).localCheckpoint(eager=True)
        if rejected.limit(1).count() == 0:
            return ranked.select(*scored.columns)
        remaining = swap_checkpoint(
            remaining.join(rejected, [id_col, shard_col], "left_anti"), remaining
        )
        if remaining.limit(1).count() == 0:
            return scored.limit(0)


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
    # keep empty clusters: k_eff·cap ≥ n must hold or the spill has nowhere
    # to go (silent point loss — see the unplaced assertion below)
    centroids, _ = lloyd(points, k, n_iter=n_iter, metric=metric, seed=seed, drop_empty=False)
    k_eff = len(centroids)
    if k_eff * max_cluster_size < n:
        raise ValueError(
            f"infeasible balance: k={k_eff} × cap={max_cluster_size} < n={n}"
        )
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
        # range(k_eff), not sizes.keys(): a shard that never received a point
        # is absent from sizes yet is exactly the spare capacity we need.
        room = {
            s: max_cluster_size - int(sizes.get(s, 0))
            for s in range(k_eff)
            if int(sizes.get(s, 0)) < max_cluster_size
        }
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
        placed = capacity_fill(rated, caps).localCheckpoint(eager=True)
        # every spilled point must land somewhere — silent loss would shrink
        # the assignment (feasibility was checked up front, so this is a bug
        # trap, not an expected path)
        n_spill, n_placed = spill_ids.count(), placed.count()
        if n_placed != n_spill:
            raise RuntimeError(f"capacity_fill stranded {n_spill - n_placed} of {n_spill} spill points")
        assignment = swap_checkpoint(
            keep.select("id", "shard", "dist").unionByName(placed.select("id", "shard", "dist")), assignment
        )
        release_local_checkpoint(placed)

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


def balanced_kmeans_bkm(
    points: DataFrame,
    k: int,
    max_cluster_size: int,
    n_lloyd_iter: int = 10,
    max_rounds: int = 30,
    metric: str = "l2",
    seed: int = SEED,
    inflow_slack: float = 0.10,
) -> tuple[np.ndarray, DataFrame]:
    """BKM+ balanced k-means as synchronous supersteps.

    ≙ BalancedKMeans (kmeans.cpp:253-524). Faithful pieces:

    - warm start from plain Lloyd (kmeans.cpp:254);
    - move score = pos_distance(p, c_j) + penalty · |cluster_j|
      (kmeans.cpp:426) with moves gated exactly like the reference: to a
      *larger* cluster only if the penalty threshold allows it
      (kmeans.cpp:433-449);
    - per-point ``penalty_needed`` = (dist_j − dist_old)/(|old|−|j|), the
      adaptive schedule ``penalty = (1.5009 − 0.0009·round) · min penalty``
      (kmeans.cpp:295-301, :474), switching to 1.01 after round 100;
    - track the best *balanced* partition by objective, stop when balanced
      and no longer improving (kmeans.cpp:465-472);
    - final greedy re-migration pins the hard cap (kmeans.cpp:494-515) via
      the iterated ``capacity_fill``.

    Batched deviation (SURVEY §7): the reference interleaves 1000 sequential
    mini-batches per round with continuous size updates; synchronous
    supersteps instead gate each cluster's net inflow per round (capacity
    window over move gain) to prevent the oscillation that continuous
    updates suppress. The invariant that matters — final balance ≤ cap with
    Lloyd-quality objective — is enforced by the same final re-migration the
    reference relies on.
    """
    spark = points.sparkSession
    n = points.count()
    centroids, _ = lloyd(points, k, n_iter=n_lloyd_iter, metric=metric, seed=seed, drop_empty=False)
    k_eff = len(centroids)
    if k_eff * max_cluster_size < n:
        raise ValueError(f"infeasible balance: k={k_eff} × cap={max_cluster_size} < n={n}")
    assignment = assign_to_centroids(points, centroids, metric).localCheckpoint(eager=True)
    pts = points.select("id", "vec").repartition("id").cache()

    def sizes_of(asn: DataFrame) -> np.ndarray:
        out = np.zeros(k_eff, dtype=np.int64)
        for r in asn.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect():
            out[int(r["shard"])] = int(r["c"])
        return out

    sizes = sizes_of(assignment)
    penalty = 0.0
    best_balanced: DataFrame | None = None
    best_objective = np.inf

    for rnd in range(1, max_rounds + 1):
        bc = spark.sparkContext.broadcast((centroids, sizes, penalty))
        state = pts.join(assignment, "id")

        def score_moves(batches):
            C, SZ, pen = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                old = pdf["shard"].to_numpy()
                d = pos_distance_matrix(X, C, metric)
                score = d + pen * SZ[None, :]
                old_d = d[np.arange(len(X)), old]
                old_sz = SZ[old]
                denom = old_sz[:, None] - SZ[None, :]
                denom[denom == 0] = 1
                pen_needed = (d - old_d[:, None]) / denom
                # moves to larger clusters allowed only if pen >= pen_needed
                to_larger = SZ[None, :] >= old_sz[:, None]
                blocked = to_larger & (pen < pen_needed)
                score[blocked] = np.inf
                score[np.arange(len(X)), old] = old_d + pen * old_sz  # own score
                best = score.argmin(1)
                gain = score[np.arange(len(X)), old] - score[np.arange(len(X)), best]
                # min penalty that would unlock a smaller-cluster move
                pn = np.where((SZ[None, :] < old_sz[:, None]) & (pen < pen_needed), pen_needed, np.inf).min(1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"].to_numpy(),
                        "old": old,
                        "new": best.astype(np.int32),
                        "gain": gain,
                        "dist_new": d[np.arange(len(X)), best],
                        "pen_needed": pn,
                    }
                )

        moves = state.mapInPandas(
            score_moves, schema="id long, old int, new int, gain double, dist_new double, pen_needed double"
        ).localCheckpoint(eager=True)

        # inflow gate per target cluster: best gains first (≙ the continuous
        # size updates of the sequential mini-batches)
        room = {
            j: max(0, max_cluster_size - int(sizes[j])) + int(inflow_slack * n / k_eff) for j in range(k_eff)
        }
        caps = spark.createDataFrame([(int(j), int(c)) for j, c in room.items()], "new int, cap long")
        w_cap = Window.partitionBy("new").orderBy(F.col("gain").desc(), F.col("id").asc())
        applied = (
            moves.where((F.col("new") != F.col("old")) & (F.col("gain") > 0))
            .join(F.broadcast(caps), "new")
            .withColumn("_r", F.row_number().over(w_cap))
            .where(F.col("_r") <= F.col("cap"))
            .select("id", F.col("new").alias("shard"))
        )
        n_moved = applied.count()
        # never release a frame still referenced as best_balanced — it must
        # stay readable for the final _enforce_cap (a released localCheckpoint
        # dies with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on next read)
        assignment = swap_checkpoint(
            assignment.join(applied.withColumnRenamed("shard", "_ns"), "id", "left")
            .select("id", F.coalesce("_ns", F.col("shard")).cast("int").alias("shard")),
            assignment if assignment is not best_balanced else None,
        )
        # centroid update + objective + per-shard sizes in ONE aggregation
        # pass (a separate sizes_of() here would re-shuffle the assignment
        # for counts the superstep aggregate already computes)
        centroids, sizes, objective = _superstep_given_assignment(
            pts, assignment, k_eff, metric, prev_centroids=centroids
        )
        min_pen_needed = moves.agg(F.min("pen_needed")).collect()[0][0]
        release_local_checkpoint(moves)

        balanced = (sizes <= max_cluster_size).all()
        if balanced:
            if objective < best_objective:
                best_objective = objective
                if best_balanced is not None and best_balanced is not assignment:
                    release_local_checkpoint(best_balanced)  # superseded best
                best_balanced = assignment
            else:
                break  # balanced, no improvement → quit (kmeans.cpp:470)
        elif min_pen_needed is not None and np.isfinite(min_pen_needed):
            sched = 1.01 if rnd > 100 else (1.5009 - 0.0009 * rnd)
            penalty = sched * float(min_pen_needed)
        if n_moved == 0 and balanced:
            break

    final = best_balanced if best_balanced is not None else assignment
    if final is not assignment:
        # the last round's assignment checkpoint has no further reader once
        # an earlier round's best wins — release it (the loop's swap guard
        # kept it alive only as the candidate state)
        release_local_checkpoint(assignment)
        # `centroids` tracks the LAST round's assignment; the chosen best
        # may be from an earlier round — re-derive its own centroids so the
        # enforcement's keep/spill ranking and the returned (centroids,
        # assignment) pair are mutually consistent
        centroids, _, _ = _superstep_given_assignment(
            pts, final, k_eff, metric, prev_centroids=centroids
        )
    # hard enforcement (≙ kmeans.cpp:494-515)
    _, enforced = _enforce_cap(pts, final, centroids, max_cluster_size, metric)
    pts.unpersist()
    return centroids, enforced


def _superstep_given_assignment(
    pts: DataFrame, assignment: DataFrame, k: int, metric: str,
    prev_centroids: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Centroid means + objective for a FIXED assignment (partial/final agg,
    ≙ AggregateClustersParallel kmeans.cpp:151-204 + ObjectiveValue :246).

    A cluster with no members keeps its ``prev_centroids`` row (matching
    ``_superstep``'s empty-cluster rule) — zeroing it would park the
    centroid at the origin, where normalized corpora score every point at
    distance 1 and the penalty schedule dumps arbitrary points into it."""
    d = len(pts.select("vec").first()[0])
    joined = pts.join(assignment, "id").select("shard", "vec")

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            sh = pdf["shard"].to_numpy()
            sums = np.zeros((k, X.shape[1]))
            np.add.at(sums, sh, X)
            cnt = np.bincount(sh, minlength=k)
            nz = cnt > 0
            yield pd.DataFrame({"shard": np.arange(k)[nz], "cnt": cnt[nz], "sums": list(sums[nz])})

    agg = (
        joined.mapInPandas(partial, schema="shard int, cnt long, sums array<double>")
        .groupBy("shard")
        .agg(F.sum("cnt").alias("cnt"), *[F.sum(F.col("sums")[i]).alias(f"s{i}") for i in range(d)])
        .toPandas()
    )
    C = prev_centroids.copy() if prev_centroids is not None else np.zeros((k, d))
    sizes = np.zeros(k, dtype=np.int64)
    for _, row in agg.iterrows():
        j = int(row["shard"])
        sizes[j] = int(row["cnt"])
        C[j] = np.array([row[f"s{i}"] for i in range(d)]) / max(row["cnt"], 1)
    # objective = Σ dist(p, centroid(assigned)) via one scoring pass
    spark = pts.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def obj(batches):
        CC = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            sh = pdf["shard"].to_numpy()
            dd = distance_matrix(X, CC, metric)
            yield pd.DataFrame({"o": [float(dd[np.arange(len(X)), sh].sum())]})

    total = joined.mapInPandas(obj, schema="o double").agg(F.sum("o")).collect()[0][0] or 0.0
    return C, sizes, float(total)


def _enforce_cap(
    pts: DataFrame, assignment: DataFrame, centroids: np.ndarray, cap: int, metric: str
) -> tuple[np.ndarray, DataFrame]:
    """Greedy overflow re-migration to nearest non-full shard
    (≙ kmeans.cpp:494-515): keep the cap-closest points of each overfull
    shard, capacity_fill the rest into remaining room."""
    spark = pts.sparkSession
    asn = assignment
    for _ in range(8):
        sizes = {int(r["shard"]): int(r["c"]) for r in asn.groupBy("shard").agg(F.count(F.lit(1)).alias("c")).collect()}
        over = [s for s, c in sizes.items() if c > cap]
        if not over:
            break
        with_own = pts.join(asn, "id")
        bc = spark.sparkContext.broadcast(centroids)

        def own_dist(batches):
            C = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                sh = pdf["shard"].to_numpy()
                dd = distance_matrix(X, C, metric)
                yield pd.DataFrame({"id": pdf["id"], "shard": sh, "dist": dd[np.arange(len(X)), sh]})

        rated = with_own.mapInPandas(own_dist, schema="id long, shard int, dist double")
        w = Window.partitionBy("shard").orderBy(F.col("dist").asc(), F.col("id").asc())
        ranked = rated.withColumn("_r", F.row_number().over(w))
        keep = ranked.where(~F.col("shard").isin(over) | (F.col("_r") <= cap)).select("id", "shard")
        spill = ranked.where(F.col("shard").isin(over) & (F.col("_r") > cap)).select("id").localCheckpoint(eager=True)
        # empty shards are spare capacity too — range over all centroids
        room = {
            s: cap - int(sizes.get(s, 0)) for s in range(len(centroids)) if int(sizes.get(s, 0)) < cap
        }
        if not room:
            break
        open_shards = sorted(room)
        sub_c = centroids[open_shards]
        rated_spill = assign_all_candidates(pts.join(spill, "id", "left_semi"), sub_c, metric)
        rated_spill = rated_spill.withColumn(
            "shard", F.element_at(F.array(*[F.lit(s) for s in open_shards]), F.col("cand") + 1)
        ).drop("cand")
        caps_df = spark.createDataFrame([(int(s), int(c)) for s, c in room.items()], "shard int, cap int")
        placed = capacity_fill(rated_spill, caps_df).localCheckpoint(eager=True)
        n_spill, n_placed = spill.count(), placed.count()
        if n_placed != n_spill:
            raise RuntimeError(f"capacity_fill stranded {n_spill - n_placed} of {n_spill} spill points")
        asn = swap_checkpoint(keep.unionByName(placed.select("id", "shard")), asn if asn is not assignment else None)
        release_local_checkpoint(spill)
        release_local_checkpoint(placed)
    return centroids, asn.select("id", "shard")
