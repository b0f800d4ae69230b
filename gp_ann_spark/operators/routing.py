"""Routing layer: map a query to an ordered list of shards to probe.

Reference: ``src/kmeans_tree_router.cpp`` (hierarchical k-means tree router),
``src/hnsw_router.h`` (HNSW over routing points + 4 probe-order policies),
``src/routes.cpp`` (config sweeps, serialization).

Spark-first re-expression (BASELINE.json north_star: "HNSW-style graph
routing re-expressed as broadcast top-k scoring"): every router reduces to

  1. a **routing-point table** ``(shard, vec)`` — shard centroids, k-means
     tree nodes, or extracted tree leaves (small by construction: the
     reference caps it at ≤10M points, routes.cpp:130);
  2. one **broadcast top-k scoring** pass of the query batch against that
     table (mapInPandas + BLAS — exact top-K, replacing the reference's
     approximate HNSW descent, whose RNG is not reproducible anyway); and
  3. pure-DataFrame post-processing of ``(query_id, shard, min_dist, votes)``
     into a probe order, one policy per reference probe-order variant.

Routes are a relation ``(query_id, shard, probe_rank)`` (RoutingConfig,
routes.h:6-20) — join-friendly, Parquet-serializable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gp_ann_spark.functions.distances import distance_matrix, pairwise_sqr_l2

SEED = 555

POLICIES = ("min_dist", "frequency", "pyramid", "spann")


def shard_centroids(points: DataFrame, assignment: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Per-shard mean vector → routing-point table ``(shard, vec)``.

    Partial/final aggregation: posexplode-free — sums the arrays elementwise
    with one mapInPandas partial pass (same pattern as k-means centroid agg).
    """
    joined = points.join(assignment, "id").select("shard", vec_col)
    schema = "shard int, cnt long, sums array<double>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            shards = pdf["shard"].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            uniq = np.unique(shards)
            pos = np.searchsorted(uniq, shards)
            sums = np.zeros((len(uniq), X.shape[1]))
            np.add.at(sums, pos, X)
            cnt = np.bincount(pos, minlength=len(uniq))
            yield pd.DataFrame({"shard": uniq, "cnt": cnt, "sums": list(sums)})

    d = len(joined.select(vec_col).first()[0])
    agg = (
        joined.mapInPandas(partial, schema=schema)
        .groupBy("shard")
        .agg(F.sum("cnt").alias("cnt"), *[F.sum(F.col("sums")[i]).alias(f"s{i}") for i in range(d)])
    )
    return agg.select(
        "shard",
        # double, not float32: centroid → query distances must rank the same
        # way as the float64/DuckDB oracles (ties aside)
        F.array(*[(F.col(f"s{i}") / F.col("cnt")).cast("double") for i in range(d)]).alias("vec"),
    )


def _routing_matrix(routing_points: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    pdf = routing_points.select("shard", "vec").toPandas()
    shards = pdf["shard"].to_numpy().astype(np.int64)
    vecs = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
    return shards, vecs


def score_routing_points(
    queries: DataFrame,
    routing_points: DataFrame,
    num_voting: int = 20,
    metric: str = "l2",
    q_id_col: str = "query_id",
    q_vec_col: str = "vec",
) -> DataFrame:
    """Broadcast top-k scoring of queries against the routing-point table.

    ≙ HNSWRouter::Query (hnsw_router.h:106-119) + shard-membership lookup
    (:112-117): for each query take the ``num_voting`` nearest routing
    points, then per (query, shard) emit min distance and hit count.
    Returns ``(query_id, shard, min_dist, votes)``.
    """
    spark = queries.sparkSession
    shards, vecs = _routing_matrix(routing_points)
    bc = spark.sparkContext.broadcast((shards, vecs))
    schema = f"{q_id_col} long, shard int, min_dist double, votes long"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sh, V = bc.value
        nv = min(num_voting, len(sh))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf[q_vec_col].to_numpy()).astype(np.float64)
            dists = distance_matrix(Q, V, metric)  # (nq, n_routing)
            if nv < dists.shape[1]:
                idx = np.argpartition(dists, nv - 1, axis=1)[:, :nv]
            else:
                idx = np.tile(np.arange(dists.shape[1]), (len(Q), 1))
            qids = pdf[q_id_col].to_numpy()
            # vectorized (query, shard) reduction — one groupby per Arrow
            # batch instead of a Python loop per query
            nv_eff = idx.shape[1]
            flat = pd.DataFrame(
                {
                    q_id_col: np.repeat(qids, nv_eff),
                    "shard": sh[idx.ravel()].astype(np.int32),
                    "min_dist": np.take_along_axis(dists, idx, axis=1).ravel(),
                }
            )
            out = flat.groupby([q_id_col, "shard"], sort=False, as_index=False).agg(
                min_dist=("min_dist", "min"), votes=("min_dist", "size")
            )
            yield out[[q_id_col, "shard", "min_dist", "votes"]]

    return queries.select(q_id_col, q_vec_col).mapInPandas(score, schema=schema)


def probe_order(
    scored: DataFrame,
    policy: str = "min_dist",
    spann_eps: float = 0.6,
    q_id_col: str = "query_id",
) -> DataFrame:
    """Turn (query, shard, min_dist, votes) into (query, shard, probe_rank).

    The reference's 4 probe-order policies (hnsw_router.h:55-104) as pure
    DataFrame post-processing:

    - ``min_dist``  — shards ascending by min routing-point distance (:59-64);
    - ``pyramid``   — only shards actually hit, by min distance (:66-74) —
      identical filter here since ``scored`` already contains only hit shards;
    - ``spann``     — (1+ε)-pruning: keep shards with
      min_dist ≤ (1+ε)·best (:76-85);
    - ``frequency`` — descending hit votes, tie by min distance (:87-103).
    """
    if policy not in POLICIES:
        raise ValueError(f"policy must be one of {POLICIES}")
    if policy == "frequency":
        order = [F.col("votes").desc(), F.col("min_dist").asc(), F.col("shard").asc()]
    else:
        order = [F.col("min_dist").asc(), F.col("shard").asc()]
    df = scored
    if policy == "spann":
        w_q = Window.partitionBy(q_id_col)
        df = df.withColumn("_best", F.min("min_dist").over(w_q)).where(
            F.col("min_dist") <= (1.0 + spann_eps) * F.col("_best")
        ).drop("_best")
    w = Window.partitionBy(q_id_col).orderBy(*order)
    return df.withColumn("probe_rank", F.row_number().over(w)).select(q_id_col, "shard", "probe_rank")


def centroid_router(
    queries: DataFrame, points: DataFrame, assignment: DataFrame,
    metric: str = "l2", policy: str = "min_dist",
) -> DataFrame:
    """Single-centroid-per-shard router (≙ the single-center routing baseline
    analyze_approximation_losses.cpp:92-142): routing table = shard means."""
    cents = shard_centroids(points, assignment)
    scored = score_routing_points(queries, cents, num_voting=int(1e9), metric=metric)
    return probe_order(scored, policy=policy)


def uniform_sample_router(
    queries: DataFrame,
    points: DataFrame,
    assignment: DataFrame,
    budget: int,
    metric: str = "l2",
    policy: str = "min_dist",
    seed: int = 420,
) -> DataFrame:
    """Uniform-random-sample routing baseline (≙ the "uniform sample" arm of
    analyze_approximation_losses.cpp:223-237): ``budget`` seed-420 sampled
    points become routing points labeled with their own shard; routes come
    from brute-force scoring against them. Deterministic hash-rank sample
    (orderBy+limit compiles to a distributed TakeOrdered, no global sort
    shuffle; the reference uses std::sample with mt19937(420))."""
    rp = (
        points.select("id", "vec")
        .orderBy(F.xxhash64("id", F.lit(seed)))
        .limit(int(budget))
        .join(assignment, "id")
        .select("shard", "vec")
    )
    scored = score_routing_points(queries, rp, num_voting=int(1e9), metric=metric)
    return probe_order(scored, policy=policy)


# ------------------------------------------------------ k-means tree router
def train_kmeans_tree(
    points: DataFrame,
    assignment: DataFrame,
    branching: int = 64,
    min_cluster_size: int = 350,
    max_nodes_per_shard: int = 2000,
    seed: int = SEED,
    sample_per_shard: int | None = 50_000,
) -> DataFrame:
    """Train one k-means tree per shard; emit the flat routing-point table.

    ≙ KMeansTreeRouter::Train/TrainRecursive (kmeans_tree_router.cpp:9-78;
    options kmeans_tree_router.h:6-11: branching 64, min_cluster_size 350,
    budget-capped node count) and ExtractPoints (:174-201) — the flat
    ``(shard, vec)`` table IS the extracted routing point set.

    One ``applyInPandas`` per shard builds the tree locally in NumPy
    (per-group data is one shard; at extreme scale cap it with
    ``sample_per_shard`` — a deterministic xxhash64 pre-filter, not rand()).
    """
    joined = points.join(assignment, "id").select("shard", "id", "vec")
    if sample_per_shard is not None:
        w = Window.partitionBy("shard").orderBy(F.xxhash64("id", F.lit(seed)))
        joined = joined.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= sample_per_shard).drop("_r")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        rng = np.random.default_rng(seed + shard)
        nodes: list[np.ndarray] = []

        def rec(idx: np.ndarray) -> None:
            if len(nodes) >= max_nodes_per_shard or len(idx) <= min_cluster_size:
                return
            k = min(branching, max(2, len(idx) // min_cluster_size))
            sub = X[idx]
            # mini Lloyd (numpy, 8 iters) on this node's points
            ci = rng.choice(len(sub), size=min(k, len(sub)), replace=False)
            C = sub[ci]
            for _ in range(8):
                # BLAS m×k kernel, NOT (m,k,d) broadcasting — at
                # sample_per_shard=50k, k=64, d=64 the tensor form is
                # ~1.6 GB per iteration per task
                d2 = pairwise_sqr_l2(sub, C)
                a = d2.argmin(1)
                for j in range(len(C)):
                    m = a == j
                    if m.any():
                        C[j] = sub[m].mean(0)
            for j in range(len(C)):
                m = a == j
                if not m.any():
                    continue
                nodes.append(C[j])
                if len(nodes) < max_nodes_per_shard:
                    rec(idx[m])

        nodes.append(X.mean(0))  # root centroid
        rec(np.arange(len(X)))
        return pd.DataFrame({"shard": shard, "vec": [v.astype(np.float32) for v in nodes]})

    return joined.groupBy("shard").applyInPandas(build, schema="shard int, vec array<float>")


def kmeans_tree_router(
    queries: DataFrame,
    routing_points: DataFrame,
    num_voting: int = 500,
    metric: str = "l2",
    policy: str = "frequency",
) -> DataFrame:
    """Query the flat tree table: broadcast top-``num_voting`` scoring + vote
    (≙ KMeansTreeRouter::FrequencyQuery kmeans_tree_router.cpp:132-172 with
    frequency policy; ::Query :93-130 with min_dist policy — the PQ traversal
    collapses to exact top-K against all tree nodes, which dominates the
    budgeted best-first search in recall at equal routing-point count)."""
    scored = score_routing_points(queries, routing_points, num_voting=num_voting, metric=metric)
    return probe_order(scored, policy=policy)
