"""Experiment driver parity with the reference's ``experiments.py``: loop
(dataset × partitioning method × num_shards × overlap), computing partitions
then running query attribution — the exact workflow a user of the reference
runs today, over this engine's CLI (reference experiments.py:57-113).

    python tools/experiments.py \
        --data-path /root/testdata/sf0.001 \
        --dataset emb=embeddings.parquet:L2 \
        --methods GP,KMeans --shards 4 --overlaps 0.2 \
        --out exp_outputs

Per dataset the driver expects ``<file>`` (base points) and uses the same
file for queries unless ``<file>@<query_file>`` is given; ground truth is
computed-or-validated at ``<out>/<dataset>_ground-truth.bin`` in the
reference's binary interchange format (points_io.cpp:136-179). Partition
artifacts land as the CLI writes them (``.k=<s>.<method>[.o=<o>]``),
mirroring the reference's naming (experiments.py:92-94).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cli as CLI  # noqa: E402

OVERLAPPING_ALGOS = ("OGP", "OGPS", "OBKM", "OKM", "ORKM")  # experiments.py:48
NUM_NEIGHBORS = 10  # experiments.py:50


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-path", required=True)
    ap.add_argument(
        "--dataset",
        action="append",
        required=True,
        help="name=base_file[@query_file][:metric] (metric L2|mips, default L2)",
    )
    ap.add_argument("--methods", default="GP,BalancedKMeans")  # experiments.py:30-41
    ap.add_argument("--shards", default="40")  # experiments.py:44
    ap.add_argument("--overlaps", default="0.2,0.0")  # experiments.py:46
    ap.add_argument("--out", default="exp_outputs")
    ap.add_argument("--k", type=int, default=NUM_NEIGHBORS)
    return ap.parse_args(argv)


def _datasets(args):
    out = {}
    for spec in args.dataset:
        name, rest = spec.split("=", 1)
        metric = "L2"
        if ":" in rest:
            rest, metric = rest.rsplit(":", 1)
        base, query = (rest.split("@", 1) + [None])[:2] if "@" in rest else (rest, None)
        out[name] = {
            "base": os.path.join(args.data_path, base),
            "query": os.path.join(args.data_path, query) if query else os.path.join(args.data_path, base),
            "metric": metric,
        }
    return out


def _set_metric(ds):
    """≙ choosing the release_l2 / release_mips build folder
    (experiments.py:52-55): the CLI reads GP_ANN_METRIC per call."""
    os.environ["GP_ANN_METRIC"] = "mips" if ds["metric"].lower() == "mips" else "l2"


def compute_all_partitions(spark, args, datasets):
    """≙ compute_all_partitions (experiments.py:73-81)."""
    for name, ds in datasets.items():
        _set_metric(ds)
        for method in args.methods.split(","):
            for s in (int(x) for x in args.shards.split(",")):
                part_prefix = os.path.join(args.out, f"{name}.partition")
                if method in OVERLAPPING_ALGOS:
                    for o in (float(x) for x in args.overlaps.split(",")):
                        CLI.main(
                            ["partition", ds["base"], part_prefix, str(s), method, "default", str(o)],
                            spark=spark,
                        )
                else:
                    CLI.main(
                        ["partition", ds["base"], part_prefix, str(s), method, "default"],
                        spark=spark,
                    )


def run_queries_on_all_datasets(spark, args, datasets):
    """≙ run_queries_on_all_datasets (experiments.py:101-110)."""
    for name, ds in datasets.items():
        _set_metric(ds)
        gt_file = os.path.join(args.out, f"{name}_ground-truth.bin")
        for method in args.methods.split(","):
            for s in (int(x) for x in args.shards.split(",")):
                overlaps = (
                    [float(x) for x in args.overlaps.split(",")]
                    if method in OVERLAPPING_ALGOS
                    else [0.0]
                )
                for o in overlaps:
                    # match cmd_partition's naming exactly: overlap 0.0
                    # writes no suffix (cli.py part_file)
                    sfx = f".o={o}" if (method in OVERLAPPING_ALGOS and o) else ""
                    ext = ".clusters" if method in OVERLAPPING_ALGOS else ".parquet"
                    part_file = os.path.join(
                        args.out, f"{name}.partition.k={s}.{method}{sfx}{ext}"
                    )
                    result_out = os.path.join(args.out, f"{name}.{method}.k={s}{sfx}")
                    CLI.main(
                        [
                            "query-attribution",
                            ds["base"],
                            ds["query"],
                            gt_file,
                            str(args.k),
                            part_file,
                            result_out,
                            str(s),
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

        spark = get_spark("gp_ann_experiments", master=os.environ.get("SPARK_MASTER", "local[8]"))
    try:
        compute_all_partitions(spark, args, datasets)
        run_queries_on_all_datasets(spark, args, datasets)
    finally:
        if own:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
