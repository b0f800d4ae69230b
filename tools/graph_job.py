"""spark-submit-able graph-analytics job with durable checkpoint/resume —
the north_rule's deployment shape for the iterative graph layer
("resumable from checkpoint with per-partition lineage + metrics, run via
spark-submit --py-files"):

    spark-submit --master local[8] --py-files dist/gp_ann_spark.zip \
        tools/graph_job.py --algo pagerank --sf-dir /root/testdata/sf0.001 \
        --checkpoint-dir /tmp/ckpt --max-iter 20

Re-running the identical command after a kill resumes from the last
COMPLETE superstep (SuperstepCheckpointer.latest() — meta.json is written
after the data, so a torn superstep is re-run, never trusted). Prints one
JSON line: final metrics + the superstep history (delta / changed counts +
per-partition lineage is in each superstep's meta_<t>.json).

Also importable: ``main([...], spark=...)`` for tests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--algo", choices=("pagerank", "cc", "lp"), required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--max-iter", type=int, default=20)
    ap.add_argument("--k", type=int, default=5, help="k-NN edge table degree")
    ap.add_argument("--tol", type=float, default=1e-6, help="pagerank convergence tol (<=0: fixed iters)")
    ap.add_argument(
        "--checkpoint-every", type=int, default=1,
        help="durable checkpoint cadence in supersteps (1 = every superstep)",
    )
    return ap.parse_args(argv)


def main(argv=None, spark=None) -> int:
    args = parse_args(argv)
    own = spark is None
    if own:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName(f"gp_ann_graph_{args.algo}").getOrCreate()
    from gp_ann_spark.checkpoint import SuperstepCheckpointer
    from gp_ann_spark.operators import graph as G
    from gp_ann_spark.operators import knn as KNN

    pts = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .cache()
    )
    edges = KNN.symmetrize(KNN.knn_edges(pts, k=args.k)).localCheckpoint(eager=True)
    cp = SuperstepCheckpointer(args.checkpoint_dir, args.algo)
    resumed_from = cp.latest()
    if args.algo == "pagerank":
        out = G.pagerank(
            edges, tol=args.tol, max_iter=args.max_iter,
            checkpointer=cp, checkpoint_every=args.checkpoint_every,
        )
        summary = {
            "n_iter": int(out.select("n_iter").first()["n_iter"]),
            "sum_pr": round(float(out.agg(F.sum("pagerank")).first()[0]), 6),
        }
    elif args.algo == "cc":
        out = G.connected_components(edges, max_iter=args.max_iter, checkpointer=cp)
        summary = {"n_components": int(out.select("component").distinct().count())}
    else:
        out = G.label_propagation(edges, n_iter=args.max_iter, checkpointer=cp)
        summary = {"n_labels": int(out.select("label").distinct().count())}
    print(
        json.dumps(
            {
                "algo": args.algo,
                "rows": out.count(),
                "resumed_from_superstep": resumed_from,
                "checkpoints": cp.latest(),
                **summary,
                "history": cp.history,
            }
        )
    )
    if own:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
