"""Headline benchmark: times the engine's flagship operators at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

The query set mirrors the reference's experiment pipeline
(run_query_attribution.cpp): build the k-NN edge table, partition it, run
the graph witnesses (PageRank/CC/triangles), route + probe + recall curve,
plus the corpus-side dedup/text stages.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gp_ann_spark.eval import recall as R
from gp_ann_spark.operators import dedup as DD
from gp_ann_spark.operators import graph as G
from gp_ann_spark.operators import knn as KNN
from gp_ann_spark.operators import knn_approx as KA
from gp_ann_spark.operators import partition as P
from gp_ann_spark.operators import routing as RT
from gp_ann_spark.operators import sweep as SW
from gp_ann_spark.operators import text_analysis as TA
from gp_ann_spark.session import get_spark

K = 10
NUM_SHARDS = 16


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("gp_ann_bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    points = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .repartition(cpus)
        .cache()
    )
    n_points = points.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus).cache()
    docs.count()

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    extra: dict = {}
    state: dict = {}
    bench_start = time.time()
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "400"))

    # warmup: JVM codegen + Arrow python-worker pool, so the first timed
    # query measures the operator, not process spin-up
    spark.range(10_000_000).agg(F.sum("id")).collect()
    KNN.exact_knn(points, points.select(F.col("id").alias("query_id"), "vec").limit(64), k=5).count()

    def timed(name, fn, reps=2):
        """min-of-``reps`` — this sandbox VM shows 2-3× run-to-run noise from
        outside contention; the min is the steady-state engine number. The
        second rep is skipped once the global budget is spent. Every sample
        is kept in ``extra.spread`` so the artifact carries its own noise
        evidence (a wide spread flags contention, not a code regression)."""
        samples = []
        out = None
        for r in range(reps):
            t0 = time.time()
            out = fn()
            samples.append(round(time.time() - t0, 3))
            if time.time() - bench_start > budget_s:
                break
        timings[name] = min(samples)
        spreads[name] = samples
        return out

    # 1. exact k-NN edge table (oracle path, broadcast top-k scoring)
    state["edges"] = timed(
        "build_knn_edges_exact",
        lambda: KNN.symmetrize(KNN.knn_edges(points, k=K)).localCheckpoint(eager=True),
    )
    # 2. approximate builder (the 10^12-scale path)
    timed(
        "build_knn_edges_approx",
        lambda: KA.build_knn_graph(
            points, k=K, max_cluster_size=500, top_level_leaders=max(8, n_points // 250), repetitions=3
        ).count(),
    )
    edges = state["edges"]
    # 3-5. graph witnesses
    timed("pagerank_15it", lambda: G.pagerank(edges, tol=0.0, max_iter=15).count())
    timed("connected_components", lambda: G.connected_components(edges).count())
    timed("triangle_count", lambda: G.triangle_count(edges).collect())
    # 6. multilevel graph partition + balance
    asn = timed(
        "graph_partition",
        lambda: P.graph_partition(edges, num_shards=NUM_SHARDS, coarse_target=256).localCheckpoint(eager=True),
    )
    extra["imbalance"] = round(P.imbalance(asn, NUM_SHARDS), 4)
    # 7. route + probe + recall curve (1000-query batch, ≙ eval harness)
    # deterministic query set (limit() is partition-order dependent)
    qs = (
        points.where(F.col("id") < min(1000, n_points))
        .select(F.col("id").alias("query_id"), "vec")
        .localCheckpoint(eager=True)
    )
    nq = qs.count()
    gt = R.ground_truth(points, qs, k=K).localCheckpoint(eager=True)

    def route_and_eval():
        routes = RT.centroid_router(qs, points, asn)
        curve = R.recall_vs_probes(gt, asn, routes, K, nq).orderBy("nprobes").collect()
        return curve

    curve = timed("route_recall_curve", route_and_eval)
    for row in curve[:4]:
        extra[f"recall@{K}_probes{row['nprobes']}"] = round(row["recall"], 4)
    # 8. flagship sweep: route configs × in-shard ef sweep → recall/QPS
    # Pareto (≙ route_search_combination.cpp:121-226 with the sublinear
    # in-shard kernel, the reference's headline experiment)
    # deterministic sweep query set: a predicate, not limit() (the same
    # partition-order bug class the recall curve fixed in r2; limit(200)
    # made pareto_points flip between same-code runs)
    sweep_qs = qs.where(F.col("query_id") < min(200, n_points)).localCheckpoint(eager=True)

    def sweep_pareto():
        pdf = SW.routing_sweep_pareto(
            points,
            asn,
            sweep_qs,
            gt,
            k=K,
            num_shards=NUM_SHARDS,
            budgets=(512,),
            num_voting_list=(80,),
            policies=("min_dist",),
            nprobes_values=(1, 2, 4),
            in_shard="ivf",
            ef_values=(100, 300),
        )
        return pdf

    pareto = timed("routing_sweep_pareto", sweep_pareto, reps=1)
    # pareto_points depends on measured QPS and is inherently run-noisy;
    # the TIMING-FREE keys below are the round-over-round comparables
    extra["pareto_points"] = int(pareto["pareto"].sum())
    # max recall over the grid: the recall-maximal config always survives
    # the Pareto filter, so this equals pareto-best recall but is a pure
    # function of the (deterministic) query set — stable across runs
    extra["pareto_best_recall"] = round(float(pareto["recall"].max()), 4)
    extra["sweep_mean_recall"] = round(float(pareto["recall"].mean()), 4)
    # 9-10. corpus-side stages
    timed("minhash_lsh_pairs", lambda: DD.minhash_band_pairs(DD.minhash_signatures(docs)).count())
    timed(
        "text_quality_lang",
        lambda: TA.quality_features(docs).join(TA.language_id(docs), "doc_id").count(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "gp_ann_headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {**extra, "n_points": n_points, "cpus": cpus, "spread": spreads},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
