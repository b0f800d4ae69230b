"""spark-submit smoke job: prove the engine runs from a --py-files zip with
no repo checkout on the executors (north_rule deployment shape).

    spark-submit --master local[8] --py-files dist/gp_ann_spark.zip \
        tools/submit_smoke.py [sf_dir]

Runs: load points → exact k-NN edges → PageRank → prints one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("gp_ann_submit_smoke").getOrCreate()
    # imports AFTER the session exists: resolved from the --py-files zip
    from gp_ann_spark.operators import graph as G
    from gp_ann_spark.operators import knn as KNN

    pts = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .cache()
    )
    edges = KNN.symmetrize(KNN.knn_edges(pts, k=5)).localCheckpoint(eager=True)
    pr = G.pagerank(edges, tol=0.0, max_iter=5)
    top = pr.orderBy(F.col("pagerank").desc()).limit(3).collect()
    print(
        json.dumps(
            {
                "smoke": "ok",
                "n_points": pts.count(),
                "n_edges": edges.count(),
                "top_pagerank_ids": [int(r["id"]) for r in top],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
