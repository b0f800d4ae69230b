"""Structured Streaming front-end: continuous corpus ingest that keeps the
points table AND the exact k-NN edge table up to date.

The reference is batch-only (SURVEY §2.8); the 100 TB pipeline is not — new
repo snapshots arrive continuously. Spark-first shape:

- ``readStream`` over the landing directory (file source = the bounded-state
  streaming source; on a real deployment this is the same code over Kafka or
  an Iceberg CDC feed);
- every micro-batch runs the BATCH operators inside ``foreachBatch`` —
  sha256 dedup against the sink (anti-join on the hash, a pruned parquet
  read), the pure-Catalyst featurizer, then ``incremental_knn_update``
  (broadcast the new batch twice — forward top-k + reverse threshold pass)
  so the edge table stays EXACT without ever recomputing old×old pairs;
- exactly-once across restarts comes from the checkpointLocation +
  idempotent-by-construction sinks (dedup by content hash);
- ``trigger(availableNow=True)`` drains the backlog and stops — the batch
  API and the streaming API are the same engine, so tests drive real
  streaming queries deterministically.

State note: the alternative 'stateful dropDuplicates' keeps every hash in
the state store forever; the sink anti-join keeps state IN THE SINK (a
columnar hash index at scale), which is the pattern that survives 10^12
files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gp_ann_spark.corpus.ingest import featurize
from gp_ann_spark.operators.knn import incremental_knn_update, knn_edges

REPO_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _sink_exists(path: str) -> bool:
    return os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    points_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    dim: int = 64,
    metric: str = "l2",
) -> None:
    """Drain the landing directory: dedup → featurize → maintain the k-NN
    edge table. Blocks until the backlog is processed (availableNow)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # 1. content-hash dedup WITHIN the batch (keep lexicographically
        #    first provenance, like corpus.dedup_files) ...
        hashed = batch_df.withColumn("sha256", F.sha2(F.col("content"), 256))
        batch_unique = (
            hashed.groupBy("sha256")
            .agg(F.min(F.struct("repo", "path", "lang", "content")).alias("rep"))
            .select("sha256", F.col("rep.content").alias("content"))
        )
        # 2. ... and against the sink (anti-join on the hash — state lives in
        #    the sink, not the state store)
        if _sink_exists(points_dir):
            seen = spark.read.parquet(points_dir).select("sha256")
            batch_unique = batch_unique.join(seen, "sha256", "left_anti")
        batch_unique = batch_unique.localCheckpoint(eager=True)
        if batch_unique.limit(1).count() == 0:
            return
        # 3. dense ids continue from the sink's max id (deterministic within
        #    the batch: rank by sha256)
        offset = 0
        existing = None
        if _sink_exists(points_dir):
            existing = spark.read.parquet(points_dir)
            offset = existing.agg(F.max("id")).collect()[0][0] + 1
        from pyspark.sql import Window

        w = Window.partitionBy(F.lit(0)).orderBy("sha256")
        with_ids = batch_unique.withColumn(
            "id", F.row_number().over(w).cast("long") - 1 + F.lit(offset)
        )
        new_pts = featurize(with_ids, dim=dim).join(
            with_ids.select("id", "sha256"), "id"
        ).localCheckpoint(eager=True)
        # 4. maintain the EXACT edge table incrementally
        if existing is not None and _sink_exists(edges_dir):
            edges = spark.read.parquet(edges_dir)
            updated = incremental_knn_update(
                existing.select("id", "vec"), edges, new_pts.select("id", "vec"), k=k, metric=metric
            )
            # write-then-swap: `updated` still reads the old edge files
            updated.write.mode("overwrite").parquet(edges_dir + "_next")
            spark.read.parquet(edges_dir + "_next").write.mode("overwrite").parquet(edges_dir)
        else:
            all_pts = new_pts.select("id", "vec")
            if existing is not None:
                all_pts = all_pts.unionByName(existing.select("id", "vec"))
            n_all = all_pts.count()
            if n_all > 1:
                knn_edges(all_pts, k=min(k, n_all - 1), metric=metric).write.mode(
                    "overwrite"
                ).parquet(edges_dir)
        new_pts.write.mode("append").parquet(points_dir)

    stream = spark.readStream.schema(REPO_SCHEMA).parquet(input_dir)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def lang_counts_stream(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, sink_dir: str
) -> None:
    """Classic stateful streaming aggregation over the ingest feed: running
    per-language document counts (update-mode state, the canonical
    watermark-free global aggregate). Written via foreachBatch so the sink
    is a plain parquet snapshot per drain."""
    stream = spark.readStream.schema(REPO_SCHEMA).parquet(input_dir)
    counts = stream.groupBy("lang").count()

    def save(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(sink_dir)

    q = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(save)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
