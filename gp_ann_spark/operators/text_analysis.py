"""Text analysis for training-data pipelines: token stats, quality scoring,
language ID, document fingerprinting.

No reference analogue (gp-ann consumes pre-embedded vectors); these are the
corpus-side operators a 100 TB training-data pipeline needs in front of the
embedding/ANN stages (mandated by the task brief alongside SURVEY §2).

All pure Catalyst column expressions — whole-stage codegen, no UDFs, no
shuffles (per-row narrow transforms) — and engineered to be bit-identical
with the ANSI-SQL oracles in ``__spark_entry__.oracle_sql`` (same token
split, same rounding, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (shared with the SQL oracles).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization — identical to the oracle's
    ``regexp_split_to_array(trim(text), '\\s+')``."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column, lang: str = "en") -> Column:
    lst = STOPWORDS[lang]
    return F.size(F.filter(tokens(F.lower(text)), lambda t: t.isin(*lst)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    """Count of .,;:!? characters (length delta after stripping them)."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0,1].

    score = min(1, n_tokens/64) · (1 − punct_ratio) rounded to 6 dp —
    a deterministic stand-in for learned quality classifiers; every term is
    reproducible in ANSI SQL.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = char_count(t)
    n_punct = punct_count(t)
    n_stop = stopword_count(t)
    score = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(64.0)) * (F.lit(1.0) - n_punct / F.greatest(n_chars, F.lit(1))),
        6,
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_calc"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        score.alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram-free heuristic language ID: count stopword hits per language,
    argmax with deterministic alphabetical tie-break, 'und' when all zero."""
    t = F.lower(F.col(text_col))
    hits = {lang: stopword_count(t, lang).alias(f"hits_{lang}") for lang in sorted(STOPWORDS)}
    with_hits = docs.select("doc_id", *hits.values())
    cols = [F.col(f"hits_{lang}") for lang in sorted(STOPWORDS)]
    best = F.greatest(*cols)
    # alphabetical order of langs = deterministic tie-break (first max wins)
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return with_hits.select("doc_id", *[F.col(f"hits_{lang}") for lang in sorted(STOPWORDS)], pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text (exact-dup key robust to
    whitespace/case jitter)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))
