"""Routing config sweep: the reference's headline recall/QPS experiment.

Reference: ``src/routes.cpp`` — ``GenerateRouterConfigs`` (:120-163: budget
grid 20k..10M × min_cluster_size 350 × 64 centroids, 128 for the largest
budgets), ``IterateRoutingConfigs`` (:166-311: per budget, train the k-means
tree router, emit KMeansTree + KMeansTree-Frequency routes over the
num_voting grid {20..500}, then HNSW-router configs over the *extracted*
routing points with 4 probe-order policies, plus a seeded Random baseline);
``src/route_search_combination.cpp`` (:121-226: combine every route config
with the in-shard search sweep into a (recall, QPS) grid and keep the Pareto
front).

Spark-first collapse (SURVEY §2.10 / routing.py docstring): the KMTR flat
table IS the extracted HNSW routing-point set, and our scoring is exact
broadcast top-k — so "KMeansTree", "KMeansTree-Frequency" and the four
"HNSW-*" variants all reduce to ONE scored relation per (budget, num_voting)
with a different pure-DataFrame probe-order policy each. The sweep is a
driver-side loop over a tiny config grid; each config's work (train, score,
search) is fully distributed.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gp_ann_spark.checkpoint import release_local_checkpoint
from gp_ann_spark.eval import recall as R
from gp_ann_spark.operators import routing as RT
from gp_ann_spark.operators import search as S
from gp_ann_spark.operators import shard_searches as SS

SEED = 555

# scaled-down default grids (the reference's 20k..10M budgets target 10^9
# points; these target the test corpus — pass the full grids at scale)
DEFAULT_BUDGETS = (512, 2048)
DEFAULT_NUM_VOTING = (20, 80, 200)


def generate_router_configs(
    budgets: Sequence[int] = DEFAULT_BUDGETS,
    min_cluster_size: int = 350,
) -> list[dict]:
    """≙ GenerateRouterConfigs (routes.cpp:120-163): budget grid ×
    min_cluster_size {350} × num_centroids {64} (+128 for budgets in the top
    tier)."""
    out = []
    top = max(budgets)
    for b in budgets:
        out.append({"budget": int(b), "min_cluster_size": min_cluster_size, "num_centroids": 64})
        if b == top and len(budgets) > 1:
            out.append({"budget": int(b), "min_cluster_size": min_cluster_size, "num_centroids": 128})
    return out


def random_routes(queries: DataFrame, num_shards: int, seed: int = SEED) -> DataFrame:
    """Seeded random probe order per query (≙ routes.cpp:269-285)."""
    spark = queries.sparkSession
    shards = F.broadcast(spark.createDataFrame([(int(s),) for s in range(num_shards)], "shard int"))
    w = Window.partitionBy("query_id").orderBy(F.xxhash64("query_id", "shard", F.lit(seed)))
    return (
        queries.select("query_id")
        .crossJoin(shards)
        .withColumn("probe_rank", F.row_number().over(w))
    )


def iterate_routing_configs(
    points: DataFrame,
    assignment: DataFrame,
    queries: DataFrame,
    gt: DataFrame,
    k: int = 10,
    num_shards: int | None = None,
    budgets: Sequence[int] = DEFAULT_BUDGETS,
    num_voting_list: Sequence[int] = DEFAULT_NUM_VOTING,
    policies: Sequence[str] = RT.POLICIES,
    cover: DataFrame | None = None,
    metric: str = "l2",
    seed: int = SEED,
    n_queries: int | None = None,
) -> list[dict]:
    """The config sweep (≙ IterateRoutingConfigs routes.cpp:166-311).

    Returns one dict per route config: algorithm/budget/num_voting plus the
    serializable ``routes`` relation and its max-first-shard recall.
    ``n_queries`` lets a caller that already counted the query batch skip
    the recount job.
    """
    cover = cover if cover is not None else assignment
    num_shards = num_shards or (assignment.agg(F.max("shard")).collect()[0][0] + 1)
    nq = n_queries if n_queries is not None else queries.count()
    out: list[dict] = []
    for cfg in generate_router_configs(budgets):
        rp = RT.train_kmeans_tree(
            points,
            assignment,
            branching=cfg["num_centroids"],
            min_cluster_size=cfg["min_cluster_size"],
            max_nodes_per_shard=max(1, cfg["budget"] // num_shards),
            seed=seed,
        ).localCheckpoint(eager=False)  # the count below materializes: 1 job
        n_rp = rp.count()
        for nv in num_voting_list:
            scored = RT.score_routing_points(
                queries, rp, num_voting=nv, metric=metric,
                # n_rp is already counted off the checkpointed table — no
                # size-probe job per (config, num_voting) grid cell
                distributed=n_rp > RT.MAX_BROADCAST_ROUTING_POINTS,
            ).localCheckpoint(eager=False)  # materialized by the first
            # routes materialization below; released after the policy loop
            for policy in policies:
                # checkpoint the (small, nq×shards) routes relation so the
                # (bigger) scored checkpoint can be released per grid cell —
                # a full reference-shaped grid (~10 budgets × 7 nv) would
                # otherwise pin ~80 scored/routing tables for the session.
                # Non-eager: the first_shard_recall count is the
                # materializing action — one job per policy, not two.
                routes = RT.probe_order(scored, policy=policy).localCheckpoint(eager=False)
                fsr = R.first_shard_recall(gt, cover, routes, k, nq)
                out.append(
                    {
                        "algorithm": f"KMeansTree-{policy}",
                        "budget": cfg["budget"],
                        "num_centroids": cfg["num_centroids"],
                        "num_voting": nv,
                        "n_routing_points": n_rp,
                        "first_shard_recall": fsr,
                        "routes": routes,
                    }
                )
            release_local_checkpoint(scored)
        release_local_checkpoint(rp)
    rr = random_routes(queries, num_shards, seed).localCheckpoint(eager=False)
    out.append(
        {
            "algorithm": "Random",
            "budget": 0,
            "num_centroids": 0,
            "num_voting": 0,
            "n_routing_points": 0,
            "first_shard_recall": R.first_shard_recall(gt, cover, rr, k, nq),
            "routes": rr,
        }
    )
    return out


def routing_sweep_pareto(
    points: DataFrame,
    assignment: DataFrame,
    queries: DataFrame,
    gt: DataFrame,
    k: int = 10,
    num_shards: int | None = None,
    budgets: Sequence[int] = DEFAULT_BUDGETS,
    num_voting_list: Sequence[int] = DEFAULT_NUM_VOTING,
    nprobes_values: Iterable[int] | None = None,
    policies: Sequence[str] = RT.POLICIES,
    metric: str = "l2",
    seed: int = SEED,
    in_shard: str = "exact",
    ef_values: Iterable[int] | None = None,
) -> pd.DataFrame:
    """End-to-end recall/QPS Pareto table (≙ route_search_combination.cpp:
    121-226): every route config × the timed in-shard search sweep →
    (config, nprobes, recall, qps) rows with a global Pareto flag.

    ``in_shard="ivf"`` runs the reference's full experiment shape: the
    sublinear in-shard kernel swept over the ef grid, so the output exposes
    the ef-vs-nprobes recall/QPS trade-off (ef column; 0 = exact search).

    Output is a config-grid-sized pandas frame (the reference also
    post-processes driver-side); all heavy stages are DataFrame programs.
    """
    num_shards = num_shards or (assignment.agg(F.max("shard")).collect()[0][0] + 1)
    nprobes_values = list(nprobes_values or range(1, num_shards + 1))
    ef_list = sorted(set(int(e) for e in (ef_values or SS.EF_SWEEP)))
    nq = queries.count()
    configs = iterate_routing_configs(
        points, assignment, queries, gt, k, num_shards, budgets, num_voting_list,
        policies=policies, metric=metric, seed=seed, n_queries=nq,
    )
    # EAGER on purpose: the config threads below all read `sharded`
    # concurrently — a lazy checkpoint would let several threads race to
    # materialize the full point table at once (duplicated compute); one
    # up-front job, then every thread hits the cache. (`sr_all` inside each
    # thread stays non-eager: it is private to that thread.)
    sharded = S.shard_points(points, assignment).localCheckpoint(eager=True)

    def eval_config(cfg) -> list[dict]:
        """Sweep-evaluate ONE route config; configs are independent, so the
        driver loop runs them on a small thread pool (guide §2.6: Spark
        schedules concurrent jobs onto shared task slots — one config's
        aggregation back-fills the executor tail of another's search).
        Checkpoint lifecycle stays per-thread-sequential: everything this
        config pinned is released before the thread returns."""
        if in_shard == "ivf":
            sr_all = SS.run_in_shard_searches_sweep(
                sharded, queries, cfg["routes"], k=k, metric=metric, ef_values=ef_list, seed=seed,
            ).localCheckpoint(eager=False)
            # one grouped-by-ef pass for the whole ef sweep (2 jobs), not
            # 2·|ef| jobs over per-ef filters — row-identical grids
            grids = SS.recall_qps_grid_by_ef(sr_all, gt, k, nq, nprobes_values, ef_list)
            sweeps = [(ef, grids[int(ef)]) for ef in ef_list]
        else:
            sr_all = SS.run_in_shard_searches(sharded, queries, cfg["routes"], k=k, metric=metric)
            sr_all = sr_all.localCheckpoint(eager=False)
            sweeps = [(0, SS.recall_qps_grid(sr_all, gt, k, nq, nprobes_values))]
        out = []
        for ef, grid in sweeps:
            for _, g in grid.iterrows():
                out.append(
                    {
                        "algorithm": cfg["algorithm"],
                        "budget": cfg["budget"],
                        "num_voting": cfg["num_voting"],
                        "first_shard_recall": cfg["first_shard_recall"],
                        "ef": int(ef),
                        "nprobes": int(g["nprobes"]),
                        "recall": float(g["recall"]),
                        "qps": float(g["qps"]),
                    }
                )
        release_local_checkpoint(sr_all)
        # the routes relation was checkpointed per grid cell inside
        # iterate_routing_configs and is not returned — release it too, or a
        # reference-shaped grid (~10 budgets × 7 nv × 4 policies) pins ~280
        # small tables in executor storage for the session
        release_local_checkpoint(cfg["routes"])
        return out

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, max(1, len(configs)))) as ex:
        per_config = list(ex.map(eval_config, configs))
    # rows in CONFIG ORDER regardless of thread completion order — the
    # output frame's row order (and so downstream hashes) stays deterministic
    rows = [r for chunk in per_config for r in chunk]
    release_local_checkpoint(sharded)
    pdf = pd.DataFrame(rows)
    # global Pareto across ALL configs (reference keeps the non-dominated set)
    pdf["pareto"] = [
        not any(
            ((o.recall >= r.recall) and (o.qps > r.qps))
            or ((o.recall > r.recall) and (o.qps >= r.qps))
            for o in pdf.itertuples()
        )
        for r in pdf.itertuples()
    ]
    return pdf
