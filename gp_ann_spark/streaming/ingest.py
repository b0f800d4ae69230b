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
  idempotent-by-construction sinks (dedup by content hash). Crash-replay
  analysis: ids are allocated as max(meta, committed row count), so a crash
  between the points append and the meta write cannot re-issue committed
  ids; a crash between the edge write and the points append leaves edge
  rows naming not-yet-committed ids, but the replayed batch re-derives the
  SAME ids (same content order, same offset — the points never landed) and
  rewrites the same buckets, so the sink converges to the exact state;
- ``trigger(availableNow=True)`` drains the backlog and stops — the batch
  API and the streaming API are the same engine, so tests drive real
  streaming queries deterministically.

State note: the alternative 'stateful dropDuplicates' keeps every hash in
the state store forever; the sink anti-join keeps state IN THE SINK (a
columnar hash index at scale), which is the pattern that survives 10^12
files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gp_ann_spark.corpus.ingest import dedup_files, dense_ids, featurize
from gp_ann_spark.operators.knn import deg_kth, incremental_knn_delta, knn_edges, merge_topk

REPO_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _sink_exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _inflight_marker(points_dir: str) -> str:
    return points_dir + "_inflight"


def _read_next_id(spark: SparkSession, points_dir: str) -> int:
    """Next dense id from the one-row metadata sink.

    Reconciliation against the committed row count (ids are dense 0..n-1,
    so the count IS the next id; ``count(*)`` reads only parquet footers)
    runs ONLY when the in-flight marker from a crashed batch is present or
    the meta sink is missing — the clean path is one metadata-row read, not
    a per-batch listing of a 10^12-row sink. The reconcile repairs a stale
    meta after a crash between the points append and the meta write, which
    would otherwise let a later batch re-issue committed ids.

    The marker records the crashed batch's ``(offset, n_new)``; replay
    verifies the committed count equals either ``offset`` (append never
    landed — replay re-derives the same ids) or ``offset + n_new`` (append
    landed, only the meta write was lost). Any intermediate count means a
    TORN append (a filesystem without atomic job commit left part of the
    batch's rows in the sink): replay would assign the remaining contents
    different ids than the crashed attempt while already-written edge rows
    still name the old ids — fail loudly instead of silently binding edges
    to the wrong vectors."""
    meta_dir = points_dir + "_meta"
    meta = None
    if _sink_exists(meta_dir):
        meta = int(spark.read.parquet(meta_dir).collect()[0]["next_id"])
    marker = _inflight_marker(points_dir)
    if meta is not None and not os.path.exists(marker):
        return meta
    committed = int(spark.read.parquet(points_dir).count())
    if os.path.exists(marker):
        with open(marker) as fh:
            raw = fh.read().strip()
        try:
            m = json.loads(raw)
        except ValueError:
            m = None
        if isinstance(m, dict) and "offset" in m and "n_new" in m:
            offset, n_new = int(m["offset"]), int(m["n_new"])
            if committed not in (offset, offset + n_new):
                raise RuntimeError(
                    f"torn append detected in points sink {points_dir}: committed "
                    f"row count {committed} is neither the in-flight batch's "
                    f"offset {offset} nor offset+n_new {offset + n_new}. The "
                    "crashed batch's parquet files are partially committed — "
                    "quarantine the files newer than the marker (or delete rows "
                    f"with id >= {offset}) before resuming, or edge rows from "
                    "the crashed attempt will bind to the wrong vectors."
                )
        # legacy plain-int marker (pre-r4): no n_new to verify against
    return max(meta or 0, committed)


def _write_next_id(spark: SparkSession, points_dir: str, next_id: int) -> None:
    spark.createDataFrame([(int(next_id),)], "next_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(points_dir + "_meta")


def _write_thresholds(spark: SparkSession, thresh_dir: str, bucket_edges) -> None:
    """Refresh the (src, deg, kth) sidecar for exactly the buckets present
    in ``bucket_edges`` (a bucket-columned edge frame) — dynamic partition
    overwrite, so untouched sidecar buckets stay byte-identical like the
    edge sink's. The aggregate is knn.deg_kth — the ONE definition shared
    with the delta fallback, so sidecar and edge table cannot drift."""
    (
        deg_kth(bucket_edges, "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(thresh_dir)
    )


class _BucketedSink:
    """ONE guard/heal/migrate policy for every bucket-partitioned parquet
    sink (the edge sink and the points sink today; any future sink — a
    media-feature table, say — instantiates this instead of copying the
    logic a third time).

    Invariants enforced per sink:

    - the layout meta dir ``sink_dir + meta_suffix`` pins ``n_buckets``;
      reopening with a different value is refused (a mismatch would silently
      drop/duplicate rows in every bucket-pruned read);
    - a sink that predates the meta but HAS the bucket column gets a
      one-time consistency scan before the meta is stamped (blind stamping
      would bless wrong-bucket pruning);
    - a legacy sink WITHOUT the bucket column is either migrated in place
      (``legacy_error=None``: staged bucketed copy + two-rename swap, the
      original never deleted before the complete replacement exists) or
      refused with targeted guidance (``legacy_error`` set — the edge sink,
      where the operator must choose between rebuild and repartition);
    - ``heal`` finishes a swap interrupted at ANY crash stage
      (tests/test_streaming.py enumerates the stage matrix).
    """

    def __init__(
        self,
        sink_dir: str,
        n_buckets: int,
        bucket_col: str,
        bucket_expr,
        what: str,
        meta_suffix: str,
        mismatch_consequence: str,
        scan_error: str,
        legacy_error: str | None = None,
    ):
        self.sink_dir = sink_dir
        self.n_buckets = int(n_buckets)
        self.bucket_col = bucket_col
        self.bucket_expr = bucket_expr
        self.what = what
        self.meta_dir = sink_dir + meta_suffix
        self.mismatch_consequence = mismatch_consequence
        self.scan_error = scan_error
        self.legacy_error = legacy_error
        self.staging = sink_dir + "_staging"
        self.backup = sink_dir + "_prebucket"

    # -- layout meta ------------------------------------------------------
    def stamp(self, spark: SparkSession) -> None:
        spark.createDataFrame([(self.n_buckets,)], "n_buckets int").coalesce(
            1
        ).write.mode("overwrite").parquet(self.meta_dir)

    # -- crash healing ----------------------------------------------------
    def heal(self) -> None:
        """Finish a legacy-sink migration that crashed between its two
        renames. The swap sequence is: write complete bucketed copy to
        ``_staging`` → rename sink → ``_prebucket`` → rename ``_staging`` →
        sink → delete ``_prebucket``. A ``_prebucket`` directory therefore
        implies the staging copy was COMPLETE when the crash happened: if
        the sink is missing, promote the staging copy (or, if staging is
        somehow gone too, restore the backup); if the sink is present, only
        the final cleanup was lost. Without this, a crash in that window
        makes the next drain see "no sink" and restart dense ids at 0 over
        a live edge table. (The edge sink reuses ``_staging`` per batch for
        its dynamic-overwrite merge — that path never creates
        ``_prebucket``, so heal is a no-op there by construction.)"""
        if not os.path.isdir(self.backup):
            return
        import shutil

        if not _sink_exists(self.sink_dir):
            if os.path.isdir(self.sink_dir):
                shutil.rmtree(self.sink_dir)  # partially created target
            if _sink_exists(self.staging):
                os.rename(self.staging, self.sink_dir)
            else:
                os.rename(self.backup, self.sink_dir)
                return  # keep nothing else: migration will re-run from scratch
        shutil.rmtree(self.backup, ignore_errors=True)
        shutil.rmtree(self.staging, ignore_errors=True)

    # -- one-time legacy migration ---------------------------------------
    def _migrate_legacy(self, spark: SparkSession, sink: DataFrame) -> None:
        """Stage the bucketed copy, then SWAP via two filesystem renames
        (crash-safe on a local FS: the original sink is never deleted before
        the complete replacement is in place; Spark's mode('overwrite')
        deletes the target first, which a crash mid-write would turn into
        data loss). Remote URIs fall back to the Spark overwrite — there the
        table format's atomic commit is the real answer (see README 'Table
        format')."""
        import shutil

        sink.withColumn(self.bucket_col, self.bucket_expr).write.mode(
            "overwrite"
        ).partitionBy(self.bucket_col).parquet(self.staging)
        try:
            os.rename(self.sink_dir, self.backup)
            os.rename(self.staging, self.sink_dir)
            shutil.rmtree(self.backup)
        except OSError:
            spark.read.parquet(self.staging).write.mode("overwrite").partitionBy(
                self.bucket_col
            ).parquet(self.sink_dir)
            shutil.rmtree(self.staging, ignore_errors=True)

    # -- the guard --------------------------------------------------------
    def ensure_layout(self, spark: SparkSession) -> None:
        """Validate (or establish) the sink's bucket layout before any
        bucket-pruned read or partial overwrite touches it."""
        self.heal()
        if _sink_exists(self.meta_dir):
            stored = int(spark.read.parquet(self.meta_dir).collect()[0]["n_buckets"])
            if stored != self.n_buckets:
                raise ValueError(
                    f"{self.what} {self.sink_dir} was written with "
                    f"n_buckets={stored}; reopening with "
                    f"n_buckets={self.n_buckets} "
                    + self.mismatch_consequence.format(stored=stored)
                )
            return
        sink = spark.read.parquet(self.sink_dir)
        if self.bucket_col not in sink.columns:
            if self.legacy_error is not None:
                raise ValueError(self.legacy_error)
            self._migrate_legacy(spark, sink)
        else:
            # meta missing but the sink IS bucketed (e.g. the meta write was
            # lost): verify the stored values against THIS n_buckets before
            # stamping — blind stamping over values computed with a
            # different n_buckets would bless wrong-bucket pruning
            bad = sink.where(self.bucket_expr != F.col(self.bucket_col)).limit(1).count()
            if bad:
                raise ValueError(self.scan_error)
        self.stamp(spark)


def _points_bucket(n_buckets: int):
    """Points-sink partition key: a uniform hash of the content sha256 —
    the dedup anti-join's equi-key, so pruning to the batch's buckets is
    exact (a hash collision across buckets is impossible: same sha256 ⇒
    same bucket)."""
    return F.pmod(F.xxhash64(F.col("sha256")), F.lit(n_buckets)).cast("int")


def _edges_sink(edges_dir: str, n_buckets: int) -> _BucketedSink:
    """Edge sink: bucket = pmod(src, n_buckets). The changed-bucket list is
    computed from src but old rows are selected by their STORED bucket
    value, so a layout mismatch would silently drop/duplicate adjacency
    (≙ the maintenance contract of the bucketed incremental path). Legacy
    unbucketed sinks are refused, not migrated — the operator must pick
    rebuild vs repartition for a table that can be 10^12 rows."""
    return _BucketedSink(
        edges_dir,
        n_buckets,
        bucket_col="bucket",
        bucket_expr=F.pmod(F.col("src"), F.lit(n_buckets)).cast("int"),
        what="edge sink",
        meta_suffix="_layout",
        mismatch_consequence=(
            "would corrupt the bucketed maintenance path — repartition the "
            "sink or pass n_buckets={stored}"
        ),
        scan_error=(
            f"edge sink {edges_dir} bucket layout does not match "
            f"n_buckets={n_buckets}"
        ),
        legacy_error=(
            f"edge sink {edges_dir} is an unbucketed legacy sink (no 'bucket' "
            "partition column) — rebuild it, or repartition it once with "
            "bucket = pmod(src, n_buckets) and write partitionBy('bucket') "
            "before resuming incremental ingest"
        ),
    )


def _points_sink(points_dir: str, n_buckets: int) -> _BucketedSink:
    """Points sink: pbucket = pmod(xxhash64(sha256), n_buckets). Pruning the
    dedup anti-join with buckets computed at a different ``n_buckets`` than
    the stored values would MISS duplicates and silently double-insert rows.
    Legacy unbucketed sinks (pre-r4) are migrated in place — one O(sink)
    rewrite, after which every batch's anti-join reads only the batch's
    buckets."""
    return _BucketedSink(
        points_dir,
        n_buckets,
        bucket_col="pbucket",
        bucket_expr=_points_bucket(n_buckets),
        what="points sink",
        meta_suffix="_playout",
        mismatch_consequence=(
            "would break dedup anti-join pruning — pass n_buckets={stored}"
        ),
        scan_error=(
            f"points sink {points_dir} pbucket values do not match "
            f"n_buckets={n_buckets} — it was bucketed with a different "
            "layout; pass the original n_buckets or re-migrate"
        ),
        legacy_error=None,
    )


def ingest_stream(
    spark: SparkSession,
    input_dir: str,
    points_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    dim: int = 64,
    metric: str = "l2",
    n_buckets: int = 16,
) -> None:
    """Drain the landing directory: dedup → featurize → maintain the k-NN
    edge table. Blocks until the backlog is processed (availableNow).

    The edge sink is parquet PARTITIONED BY ``bucket = pmod(src, n_buckets)``
    and each micro-batch rewrites only the buckets whose src set intersects
    the changed ids (``incremental_knn_delta`` knows exactly which srcs can
    change) via dynamic partition overwrite — untouched buckets' files are
    left byte-identical on disk. At 10^12 edges this bounds the per-batch
    write to O(changed buckets), where the old write-then-swap rewrote the
    entire table twice per batch."""

    edges_sink = _edges_sink(edges_dir, n_buckets)
    points_sink = _points_sink(points_dir, n_buckets)
    bucket = edges_sink.bucket_expr

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # 1. content-hash dedup WITHIN the batch — the ONE definition of the
        #    keep-first-provenance rule (corpus.dedup_files), so the batch
        #    and streaming paths cannot silently diverge ...
        batch_unique = dedup_files(batch_df).select("sha256", "content")
        # 2. ... and against the sink (anti-join on the hash — state lives in
        #    the sink, not the state store). The sink is hash-bucketed by
        #    pbucket = pmod(xxhash64(sha256), n_buckets), so the anti-join
        #    reads ONLY the batch's buckets (partition-pruned scan) instead
        #    of the whole 10^12-row sink every micro-batch — same design as
        #    the edge sink.
        points_sink.heal()
        have_sink = _sink_exists(points_dir)
        if have_sink:
            points_sink.ensure_layout(spark)
            batch_buckets = [
                int(r["b"])
                for r in batch_unique.select(_points_bucket(n_buckets).alias("b"))
                .distinct()
                .collect()
            ]
            seen = (
                spark.read.parquet(points_dir)
                .where(F.col("pbucket").isin(batch_buckets))
                .select("sha256")
            )
            batch_unique = batch_unique.join(seen, "sha256", "left_anti")
        batch_unique = batch_unique.localCheckpoint(eager=True)
        n_new = batch_unique.count()
        if n_new == 0:
            # a replayed batch whose points append fully landed dedups to
            # zero — finalize the crashed attempt's bookkeeping (else the
            # marker leaks and EVERY later batch pays the count-reconcile
            # over the full sink). _read_next_id validates the marker's
            # (offset, n_new) against the committed count first, so a torn
            # append still fails loudly here rather than being blessed.
            marker = _inflight_marker(points_dir)
            if have_sink and os.path.exists(marker):
                _write_next_id(spark, points_dir, _read_next_id(spark, points_dir))
                os.remove(marker)
            return
        # 3. dense ids continue from the metadata sink's next_id
        #    (deterministic within the batch: rank by sha256, prefix-sum
        #    assignment — no single-partition window)
        offset = _read_next_id(spark, points_dir) if have_sink else 0
        existing = spark.read.parquet(points_dir) if have_sink else None
        # in-flight marker: present ⇒ a batch may have crashed between its
        # sink writes, so the next id read reconciles against the committed
        # count instead of trusting the (possibly stale) metadata row. It
        # records (offset, n_new) so replay can DETECT a torn append (a
        # committed count strictly between the two) instead of silently
        # renumbering — see _read_next_id.
        with open(_inflight_marker(points_dir), "w") as fh:
            fh.write(json.dumps({"offset": int(offset), "n_new": int(n_new)}))
        with_ids = dense_ids(batch_unique, order_col="sha256").withColumn(
            "id", F.col("id") + F.lit(offset)
        )
        new_pts = featurize(with_ids, dim=dim).join(
            with_ids.select("id", "sha256"), "id"
        ).localCheckpoint(eager=True)
        # 4. maintain the EXACT edge table incrementally, rewriting only the
        #    src-buckets that contain changed rows. The (src, deg, kth)
        #    threshold sidecar (bucket-partitioned like the edges) replaces
        #    the O(n·k)-row full-edge-table aggregate in the delta — the one
        #    remaining table-sized read — so a batch touches O(n_points)
        #    narrow rows + O(changed buckets) edge rows, never O(edges).
        thresh_dir = edges_dir + "_thresh"
        if existing is not None and _sink_exists(edges_dir):
            edges_sink.ensure_layout(spark)
            edges_full = spark.read.parquet(edges_dir)
            if not _sink_exists(thresh_dir):
                # one-time migration of a pre-sidecar sink: materialize the
                # FULL sidecar now (every bucket). The per-batch refresh
                # below rewrites only changed buckets, so an in-memory
                # partial migration would leave every other src invisible
                # (null → +inf threshold) on the NEXT batch.
                deg_kth(edges_full, "bucket").write.mode("overwrite").partitionBy(
                    "bucket"
                ).parquet(thresh_dir)
            thresholds = spark.read.parquet(thresh_dir).select("src", "deg", "kth")
            delta = incremental_knn_delta(
                existing.select("id", "vec"), None, new_pts.select("id", "vec"),
                k=k, metric=metric, thresholds=thresholds,
            ).localCheckpoint(eager=True)
            changed = [
                int(r["b"]) for r in delta.select(bucket.alias("b")).distinct().collect()
            ]
            if changed:
                # filter on the PARTITION column so the scan prunes to the
                # changed bucket directories (a pmod(src,..) predicate does
                # not map to partition pruning)
                old_changed = edges_full.where(F.col("bucket").isin(changed)).select(
                    "src", "dst", "weight"
                )
                updated = merge_topk(old_changed.unionByName(delta), k).withColumn("bucket", bucket)
                # stage, then dynamic-overwrite ONLY the changed bucket dirs
                # (can't read+overwrite the same path in one job); both
                # writes are O(changed buckets), not O(table)
                staging = edges_dir + "_staging"
                updated.write.mode("overwrite").partitionBy("bucket").parquet(staging)
                staged = spark.read.parquet(staging)
                staged.write.mode("overwrite").option(
                    "partitionOverwriteMode", "dynamic"
                ).partitionBy("bucket").parquet(edges_dir)
                _write_thresholds(spark, thresh_dir, staged)
        else:
            all_pts = new_pts.select("id", "vec")
            if existing is not None:
                all_pts = all_pts.unionByName(existing.select("id", "vec"))
            n_all = all_pts.count()
            if n_all > 1:
                full = knn_edges(all_pts, k=min(k, n_all - 1), metric=metric).withColumn("bucket", bucket)
                full.write.mode("overwrite").partitionBy("bucket").parquet(edges_dir)
                _write_thresholds(spark, thresh_dir, spark.read.parquet(edges_dir))
                edges_sink.stamp(spark)
        new_pts.withColumn("pbucket", _points_bucket(n_buckets)).write.mode(
            "append"
        ).partitionBy("pbucket").parquet(points_dir)
        if not have_sink:
            points_sink.stamp(spark)
        _write_next_id(spark, points_dir, offset + n_new)
        # clean completion: the metadata row is authoritative again
        try:
            os.remove(_inflight_marker(points_dir))
        except FileNotFoundError:
            pass

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
