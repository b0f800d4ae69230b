"""Scale probe: run the flagship pipeline at ~100× the bench point count
(default 200k points / ~64-dim, ~2-4M edges) on this box and report
throughput — the direct evidence for "would this still work at 100×".

    python tools/scale_probe.py [n_points]

Stages: synthetic points → approximate k-NN graph (reference params) →
PageRank (5 supersteps) → connected components → multilevel graph partition
(16 shards) → balance + edge-cut. One JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from gp_ann_spark.operators import graph as G
    from gp_ann_spark.operators import knn_approx as KA
    from gp_ann_spark.operators import partition as P
    from gp_ann_spark.session import get_spark

    spark = get_spark("scale_probe", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    # clustered synthetic points: 64-dim, 256 soft clusters + noise — gives
    # the k-NN graph real structure (pure noise has no partitionable cut)
    dim, n_clusters = 64, 256
    pts = (
        spark.range(n)
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    (F.pmod(F.xxhash64(F.pmod(F.col("id"), F.lit(n_clusters)), i), F.lit(200)) - 100) / 25.0
                    + (F.pmod(F.xxhash64("id", i, F.lit(7)), F.lit(200)) - 100) / 100.0
                ).cast("float"),
            ).alias("vec"),
        )
        .repartition(cpus * 2)
        .cache()
    )
    pts.count()
    t: dict[str, float] = {}

    t0 = time.time()
    edges = KA.build_knn_graph(pts, k=10, symmetric=True).localCheckpoint(eager=True)
    n_edges = edges.count()
    t["approx_knn_build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    G.pagerank(edges, tol=0.0, max_iter=5).count()
    t["pagerank_5it_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    G.connected_components(edges).select("component").distinct().count()
    t["connected_components_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    asn = P.graph_partition(edges, num_shards=16, coarse_target=4096).localCheckpoint(eager=True)
    t["graph_partition_s"] = round(time.time() - t0, 1)
    imb = P.imbalance(asn, 16)
    # edge cut fraction: edges crossing shards / all edges
    a1 = asn.withColumnRenamed("id", "src").withColumnRenamed("shard", "s1")
    a2 = asn.withColumnRenamed("id", "dst").withColumnRenamed("shard", "s2")
    cut = edges.join(a1, "src").join(a2, "dst").where(F.col("s1") != F.col("s2")).count()

    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "n_points": n,
                "n_edges": n_edges,
                "timings": t,
                "imbalance": round(imb, 4),
                "edge_cut_frac": round(cut / n_edges, 4),
                "points_per_s_knn_build": round(n / t["approx_knn_build_s"], 1),
                "edge_traversals_per_s_pagerank": round(n_edges * 5 / t["pagerank_5it_s"], 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
