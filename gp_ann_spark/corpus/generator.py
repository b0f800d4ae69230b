"""Deterministic synthetic ``repos`` corpus generator.

Produces the mandated input table (BASELINE.json ``input_hint``):

    repos(repo STRING, path STRING, commit STRING, lang STRING, content STRING)

entirely as Catalyst expressions over ``spark.range`` — no Python in the data
path, no external data, deterministic for a given ``(n_rows, seed)`` and
independent of partitioning. ~10% of rows repeat an earlier row's content to
exercise sha256 dedup (FIXTURES.md §1).

This replaces the reference's binary point readers (``points_io.cpp:14-124``)
as the front door of the pipeline; points are *derived* from content
(see ``ingest.featurize``), not read from ``.fbin`` files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("py", "java", "cpp", "go", "js")

# Code-flavored vocabulary; content is a deterministic token stream drawn
# from it. Kept at module level so the featurizer tests can reuse it.
VOCAB = (
    "def class import return if else for while try except lambda yield "
    "public static void int float double string bool struct template typename "
    "func go chan defer select interface map slice range const var let "
    "async await promise export module require this self super new delete "
    "vector list dict set tuple array matrix tensor graph node edge weight "
    "partition shard cluster centroid router query neighbor distance recall "
    "hash sha256 commit branch merge rebase diff patch blob tree index "
    "spark dataframe column row schema parquet iceberg shuffle broadcast "
    "open close read write append flush seek lock mutex atomic thread pool"
).split()


def generate_repos(spark: SparkSession, n_rows: int, seed: int = 42, n_parts: int | None = None) -> DataFrame:
    """Build the repos table.

    Every field is a pure function of ``(row id, seed)`` via xxhash64 —
    re-running at any parallelism yields identical rows, and the generator
    scales linearly (``spark.range`` is an embarrassingly parallel source).
    """
    n_repos = max(1, n_rows // 50)  # ~50 files per repo
    df = spark.range(0, n_rows, 1, n_parts or spark.sparkContext.defaultParallelism)

    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731

    # ~10% duplicate contents: rows with h("dup") % 10 == 9 reuse the content
    # key of an earlier row (id // 2) — deterministic, partition-independent.
    df = df.withColumn(
        "content_key",
        F.when((h("dup") % 10 == 9) & (F.col("id") > 0), F.col("id") / 2).otherwise(F.col("id")).cast("long"),
    )

    df = (
        df.withColumn("repo", F.concat(F.lit("org/project-"), (h("repo") % n_repos).cast("string")))
        .withColumn(
            "path",
            F.concat(
                F.lit("src/module_"),
                (h("mod") % 20).cast("string"),
                F.lit("/file_"),
                (h("file") % 1000).cast("string"),
                F.lit("."),
                F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h("lang") % len(LANGS) + 1).cast("int")),
            ),
        )
        .withColumn("commit", F.sha2(F.concat(F.col("repo"), F.lit(":"), F.lit(seed).cast("string")), 256).substr(1, 40))
        .withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h("lang") % len(LANGS) + 1).cast("int")))
        .withColumn("content", _content_expr(seed))
        .select("repo", "path", "commit", "lang", "content")
    )
    return df


def _content_expr(seed: int):
    """content = 24–88 vocab tokens, all drawn deterministically from
    ``content_key`` — built with transform/sequence, no UDF."""
    key = F.col("content_key")
    n_tok = (F.abs(F.xxhash64(key, F.lit(seed), F.lit("len"))) % 65 + 24).cast("int")
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    tok = lambda i: F.element_at(  # noqa: E731
        vocab, (F.abs(F.xxhash64(key, i, F.lit(seed), F.lit("tok"))) % len(VOCAB) + 1).cast("int")
    )
    return F.array_join(F.transform(F.sequence(F.lit(1), n_tok), tok), " ")
