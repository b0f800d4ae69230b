"""Deduplication suite for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the whole point at 100 TB):

- exact dedup: one groupBy on the content hash — uniform keys, no skew;
- MinHash/LSH: near-dup candidate generation is a *band-bucket equi-join*
  (shuffle keyed on band signatures), never an all-pairs scan; verification
  runs only on candidates;
- SimHash: signature is an aggregation over tokens (partial+final);
  near-dups = equal band of the signature (equi-join again);
- n-gram Jaccard: the shingle inverted index (explode + self-join on
  shingle) is the candidate generator; Jaccard verification on co-occurring
  pairs only. Hub shingles (stopword n-grams) are the skew risk — the
  ``max_doc_freq`` filter drops them (explicit skew handling);
- embedding near-dup: exact cosine over LSH/IVF buckets; the brute-force
  variant is the small-N oracle.

Every hash is derived from md5 hex (not xxhash64) so the DuckDB SQL oracles
reproduce signatures bit-for-bit: ``hex64(s) = int(md5(s)[:15], 16)``,
minhash_i = (a_i·(hex64 mod P) + b_i) mod P with P = 1e9+7.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gp_ann_spark.functions.distances import sql_inner_product
from gp_ann_spark.operators.text_analysis import tokens

P_MOD = 1_000_000_007
# (a, b) per minhash function — small constants so a·x' + b stays < 2^63.
MINHASH_COEFFS = [(2 * i + 1, 7919 * (i + 1)) for i in range(8)]
N_BANDS = 4  # 8 hashes → 4 bands × 2 rows


def hex64(col: Column) -> Column:
    """Deterministic 60-bit int from a string: first 15 hex chars of md5.
    Spark `conv` ≡ DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by sha256(text): per distinct content, the
    representative (min doc_id) and the duplicate count."""
    return (
        docs.withColumn("sha256", F.sha2(F.col(text_col), 256))
        .groupBy("sha256")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Matches the oracle's
    list_transform(generate_series(...)) construction: shingle i joins
    tokens i..i+n-1 with single spaces."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    # guard: Spark's sequence(0, x) is DESCENDING for x < 0 — docs shorter
    # than n tokens must yield an empty shingle set, not garbage.
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded relation — the shingle inverted index."""
    return docs.select("doc_id", F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))


def minhash_signatures(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, h0..h7): per-doc MinHash signature.

    One explode + one groupBy with 8 min-aggregates (partial+final);
    signatures are md5-derived → engine-independent.
    """
    sh = doc_shingles(docs, text_col, n).withColumn("x", hex64(F.col("shingle")) % P_MOD)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % P_MOD).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_band_pairs(signatures: DataFrame) -> DataFrame:
    """LSH candidate pairs: docs sharing at least one band (band = 2
    consecutive minhashes). Equi-join on (band_idx, band_key) — the scale
    path; returns (doc_a, doc_b) with doc_a < doc_b, distinct."""
    rows_per_band = len(MINHASH_COEFFS) // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(
                "_", *[F.col(f"h{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
            )
            for b in range(N_BANDS)
        ]
    )
    banded = signatures.select("doc_id", F.posexplode(bands).alias("band_idx", "band_key"))
    left = banded.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    return (
        left.join(right, ["band_idx", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs ≥ threshold.

    Candidate generation = shingle inverted-index self-join (only pairs
    sharing ≥1 shingle are ever scored). ``max_doc_freq`` drops hub shingles
    (present in more than that many docs) — the explicit skew guard for the
    self-join. If ``candidates`` (doc_a, doc_b) is given (e.g. from
    minhash_band_pairs), verification is restricted to it.
    Returns (doc_a, doc_b, jaccard) rounded to 6 dp.
    """
    sh = doc_shingles(docs, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_doc_freq is not None:
        rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_doc_freq)
        sh_join = sh.join(rare.select("shingle"), "shingle", "left_semi")
    else:
        sh_join = sh
    a = sh_join.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_join.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # hex64 yields 60 usable bits
SIMHASH_BAND_BITS = 15  # 4 bands × 15 bits → 32768 buckets per band


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc: bit j set iff Σ_tokens (2·bit_j(hex64(t))−1) > 0.

    Aggregation-only (explode + 60 sums, partial+final); md5-derived →
    oracle-reproducible. Returns (doc_id, simhash BIGINT).
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("tok"))
    h = tok.withColumn("x", hex64(F.col("tok")))
    sums = h.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("x"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.cast("bigint").alias("simhash"))


def simhash_near_pairs(sims: DataFrame, band_bits: int = SIMHASH_BAND_BITS) -> DataFrame:
    """Candidate near-dups: equal ``band_bits``-bit band of the simhash —
    equi-join per band, the scale path for hamming-distance search (docs
    within hamming distance < n_bands share ≥1 band by pigeonhole)."""
    n_bands = SIMHASH_BITS // band_bits
    bands = F.array(
        *[
            F.concat_ws(
                "_", F.lit(b), (F.shiftright(F.col("simhash"), b * band_bits) % (1 << band_bits)).cast("string")
            )
            for b in range(n_bands)
        ]
    )
    banded = sims.select("doc_id", F.explode(bands).alias("band"))
    l_ = banded.select(F.col("doc_id").alias("doc_a"), "band")
    r_ = banded.select(F.col("doc_id").alias("doc_b"), "band")
    return l_.join(r_, "band").where(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b").distinct()


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold — brute-force Catalyst
    variant (small-N oracle; double-precision zip_with/aggregate math matches
    DuckDB's list_cosine_similarity). The scale path buckets by IVF/LSH
    first (see similarity.ivf_topk) and verifies within buckets only.
    Returns (id_a, id_b, cos_sim) rounded to 6 dp."""
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    dot = sql_inner_product(F.col("_va"), F.col("_vb"))
    na = F.sqrt(sql_inner_product(F.col("_va"), F.col("_va")))
    nb = F.sqrt(sql_inner_product(F.col("_vb"), F.col("_vb")))
    return (
        pairs.withColumn("cos_sim", F.round(dot / (na * nb), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
