"""Physical-plan audits: the properties the 100 TB design depends on must be
visible in `.explain` — column pruning reaching the parquet scan, no
cartesian products in graded paths, the salted two-phase aggregation, and
whole-stage codegen on the Catalyst-only operators."""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fingerprint_prunes_columns(spark):
    plan = _plan(E.q_fingerprint(spark, SF_DIR))
    # ReadSchema must carry only the two needed columns of documents
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "url" not in read


def test_exact_neardup_has_no_cartesian(spark):
    plan = _plan(E.q_embedding_neardup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "FlatMapCoGroupsInPandas" in plan  # the block-grid cogroup


def test_knn_topk_has_no_cartesian(spark):
    plan = _plan(E.q_knn_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan  # broadcast top-k scoring pass


def test_jaccard_plan_shows_salted_two_phase(spark):
    plan = _plan(E.q_jaccard_pairs(spark, SF_DIR))
    # the skew guard: a pre-aggregation keyed on (shingle, _salt)
    assert "_salt" in plan


def test_minhash_band_pairs_plan_is_equi_join(spark):
    plan = _plan(E.q_minhash_band_pairs(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # candidate generation joins on the band key, not all-pairs
    assert "band_key" in plan


def test_text_quality_is_pure_catalyst(spark):
    # no Python evaluation nodes anywhere: the whole query is JVM expressions
    # over the parquet scan (codegen-eligible Project; AQE wraps the plan so
    # the literal WholeStageCodegen label only appears post-execution)
    plan = _plan(E.q_text_quality(spark, SF_DIR))
    for udf_marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert udf_marker not in plan
    assert "FileScan parquet" in plan
