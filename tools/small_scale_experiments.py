"""Small-scale experiment grid parity with the reference's
``small-scale-experiments.py``: loop (dataset × partitioning method ×
num_shards), computing partitions then running the single-machine serving
experiment — ``compute_all_partitions`` (small-scale-experiments.py:27-38)
followed by ``run_queries_on_all_datasets`` (:41-61) over this engine's CLI.

    python tools/small_scale_experiments.py \
        --data-path /root/testdata/sf0.001 \
        --dataset emb=embeddings.parquet:L2 \
        --methods GP,RKM,BalancedKMeans --shards 16 --out exp_outputs

Defaults mirror the reference grid exactly: methods {GP, RKM,
BalancedKMeans} (:11-16), num_shards 16 (:18), k=10 neighbors (:20),
``strong`` partitioner preset (:31), and the reference's artifact naming —
partitions at ``<out>/<name>.partition.k=<s>.<method>`` (:47) and result
CSVs at ``<out>/<name>.<method>.k=<s>.csv`` (:49). Ground truth is
computed-or-read at ``<out>/<name>.ground_truth.bin`` in the reference's
binary interchange format, shared across methods like the reference's
per-dataset ``<pfx>.ground_truth.bin`` (:45).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cli as CLI  # noqa: E402
from experiments import _datasets, _set_metric  # noqa: E402

NUM_NEIGHBORS = 10  # small-scale-experiments.py:20


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", required=True)
    ap.add_argument(
        "--dataset",
        action="append",
        required=True,
        help="name=base_file[@query_file][:metric] (metric L2|mips, default L2)",
    )
    # small-scale-experiments.py:11-16 (GP, RKM, BalancedKMeans active)
    ap.add_argument("--methods", default="GP,RKM,BalancedKMeans")
    ap.add_argument("--shards", default="16")  # :18
    ap.add_argument("--out", default="exp_outputs")
    ap.add_argument("--k", type=int, default=NUM_NEIGHBORS)
    ap.add_argument(
        "--preset",
        default="strong",
        choices=("default", "strong"),
        help="partitioner preset (reference passes 'strong', :31)",
    )
    ap.add_argument(
        "--skip-partition",
        action="store_true",
        help="reuse existing partition files (≙ the commented-out "
        "compute_all_partitions() call, :64)",
    )
    return ap.parse_args(argv)


def compute_all_partitions(spark, args, datasets):
    """≙ compute_all_partitions (small-scale-experiments.py:27-38)."""
    for name, ds in datasets.items():
        _set_metric(ds)
        for method in args.methods.split(","):
            for s in (int(x) for x in args.shards.split(",")):
                part_prefix = os.path.join(args.out, f"{name}.partition")
                CLI.main(
                    ["partition", ds["base"], part_prefix, str(s), method, args.preset],
                    spark=spark,
                )


def run_queries_on_all_datasets(spark, args, datasets):
    """≙ run_queries_on_all_datasets (small-scale-experiments.py:41-61)."""
    for name, ds in datasets.items():
        _set_metric(ds)
        gt_file = os.path.join(args.out, f"{name}.ground_truth.bin")
        for method in args.methods.split(","):
            for s in (int(x) for x in args.shards.split(",")):
                part_file = os.path.join(
                    args.out, f"{name}.partition.k={s}.{method}.parquet"
                )
                out_csv = os.path.join(args.out, f"{name}.{method}.k={s}.csv")
                CLI.main(
                    [
                        "small-scale-queries",
                        ds["base"],
                        ds["query"],
                        gt_file,
                        str(args.k),
                        part_file,
                        method,
                        out_csv,
                    ],
                    spark=spark,
                )


def main(argv=None, spark=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    datasets = _datasets(args)
    own = spark is None
    if own:
        from gp_ann_spark.session import get_spark

        spark = get_spark(
            "gp_ann_small_scale",
            master=os.environ.get("SPARK_MASTER", "local[8]"),
        )
    try:
        if not args.skip_partition:
            compute_all_partitions(spark, args, datasets)
        run_queries_on_all_datasets(spark, args, datasets)
    finally:
        if own:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
