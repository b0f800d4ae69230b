"""Sources/sinks: Parquet-first tables plus the reference's text formats.

Parquet (partitioned where it matters) is the engine's storage; the text
formats exist for cross-checking artifacts against the reference harness:

- METIS partition file: one shard id per line, line i = point i
  (``src/metis_io.cpp:6-24``; read remaps ids densely like the reference);
- clusters file: one whitespace-separated id list per shard line
  (``src/metis_io.cpp:40-64``);
- METIS graph file: header ``n m`` then 1-indexed adjacency per vertex line
  (``src/metis_io.cpp:26-38``, with the even-edge-count check).

Text writers collect to the driver — they are small-scale debug/interchange
artifacts only (the reference's formats are inherently single-file,
position-indexed); Parquet paths are the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_assignment(assignment: DataFrame, path: str, partition_by_shard: bool = True) -> None:
    """Parquet sink; partitioning by shard makes every shard-filtered read a
    pruned scan (≙ the seek-coalesced sharded read,
    distributed_query_benchmark.h:48-84)."""
    w = assignment.write.mode("overwrite")
    if partition_by_shard:
        w = w.partitionBy("shard")
    w.parquet(path)


def read_assignment(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_metis_partition(assignment: DataFrame, path: str) -> None:
    """≙ WriteMetisPartition (metis_io.cpp:18-24): line i = shard of point i."""
    rows = assignment.orderBy("id").select("shard").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['shard']}\n")


def read_metis_partition(spark: SparkSession, path: str) -> DataFrame:
    """≙ ReadMetisPartition (metis_io.cpp:6-16): reads one shard per line and
    densifies shard ids (the reference remaps via a hash map)."""
    with open(path) as f:
        shards = [int(line.strip()) for line in f if line.strip()]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(shards)], "id long, shard int"
    )
    dense = df.select("shard").distinct().withColumn(
        "_new", F.dense_rank().over(Window.orderBy("shard")) - 1
    )
    return df.join(F.broadcast(dense), "shard").select("id", F.col("_new").cast("int").alias("shard"))


def write_clusters(assignment: DataFrame, path: str) -> None:
    """≙ WriteClusters (metis_io.cpp:56-64): shard line = member ids."""
    rows = (
        assignment.groupBy("shard")
        .agg(F.sort_array(F.collect_list("id")).alias("members"))
        .orderBy("shard")
        .collect()
    )
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(str(m) for m in r["members"]) + "\n")


def read_clusters(spark: SparkSession, path: str) -> DataFrame:
    """≙ ReadClusters (metis_io.cpp:40-54) → assignment relation."""
    pairs = []
    with open(path) as f:
        for shard, line in enumerate(f):
            for tok in line.split():
                pairs.append((int(tok), shard))
    return spark.createDataFrame(pairs, "id long, shard int")


def write_metis_graph(edges: DataFrame, path: str) -> None:
    """≙ WriteMetisGraph (metis_io.cpp:26-38): symmetric graph, 1-indexed
    adjacency lines, header 'n m'; asserts the even-edge-count invariant."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    n_edges = sym.count()
    assert n_edges % 2 == 0, "symmetric graph must have an even directed-edge count"
    adj = (
        sym.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nbrs")).orderBy("src").collect()
    )
    n = max(r["src"] for r in adj) + 1 if adj else 0
    by_src = {r["src"]: r["nbrs"] for r in adj}
    with open(path, "w") as f:
        f.write(f"{n} {n_edges // 2}\n")
        for v in range(n):
            f.write(" ".join(str(u + 1) for u in by_src.get(v, [])) + "\n")


def write_points(points: DataFrame, path: str) -> None:
    """≙ WritePoints (points_io.cpp:126-133) — Parquet replaces the raw
    (n, d)-header binary format."""
    points.write.mode("overwrite").parquet(path)


def read_points(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_ground_truth(gt: DataFrame, path: str) -> None:
    """≙ WriteGroundTruth (points_io.cpp:161-179) — Parquet of the
    (query_id, rank, neighbor_id, dist) relation."""
    gt.write.mode("overwrite").parquet(path)


def read_ground_truth(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
