"""The spark-submit-able graph job (tools/graph_job.py): durable superstep
checkpointing + kill/resume equivalence — the north_rule's 'resumable from
checkpoint with per-partition lineage + metrics' as a runnable surface."""

import json
import sys

sys.path.insert(0, "tools")


def _run(spark, capsys, argv):
    import graph_job as GJ

    rc = GJ.main(argv, spark=spark)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _ranks(spark, ck, superstep):
    df = spark.read.parquet(f"{ck}/pagerank/superstep={superstep}")
    return {(r["id"], round(r["pagerank"], 9)) for r in df.collect()}


def test_graph_job_pagerank_resume_matches_uninterrupted(spark, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"
    ck_split = str(tmp_path / "ck_split")
    ck_full = str(tmp_path / "ck_full")
    base = ["--algo", "pagerank", "--sf-dir", sf, "--tol", "0"]

    # phase 1: run 3 supersteps, durable checkpoints each step
    out1 = _run(spark, capsys, base + ["--checkpoint-dir", ck_split, "--max-iter", "3"])
    assert out1["resumed_from_superstep"] is None
    assert out1["checkpoints"] == 3
    # per-partition lineage recorded in each superstep's meta
    meta = json.load(open(f"{ck_split}/pagerank/meta_3.json"))
    assert meta["rows"] == out1["rows"] and meta["partitions"]

    # phase 2: identical command with a higher iteration target resumes at 3
    out2 = _run(spark, capsys, base + ["--checkpoint-dir", ck_split, "--max-iter", "6"])
    assert out2["resumed_from_superstep"] == 3
    assert out2["checkpoints"] == 6

    # uninterrupted 6-superstep reference run → identical final state
    out3 = _run(spark, capsys, base + ["--checkpoint-dir", ck_full, "--max-iter", "6"])
    assert out3["resumed_from_superstep"] is None
    assert _ranks(spark, ck_split, 6) == _ranks(spark, ck_full, 6)
    assert out2["sum_pr"] == out3["sum_pr"]


def test_graph_job_cc_and_lp_run(spark, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"
    out = _run(
        spark, capsys,
        ["--algo", "cc", "--sf-dir", sf, "--checkpoint-dir", str(tmp_path / "c1"), "--max-iter", "10"],
    )
    assert out["n_components"] >= 1 and out["rows"] == 500
    # resuming a CONVERGED run is a no-op continuation with the same result
    out_b = _run(
        spark, capsys,
        ["--algo", "cc", "--sf-dir", sf, "--checkpoint-dir", str(tmp_path / "c1"), "--max-iter", "10"],
    )
    assert out_b["n_components"] == out["n_components"]
    assert out_b["resumed_from_superstep"] == out["checkpoints"]

    out_lp = _run(
        spark, capsys,
        ["--algo", "lp", "--sf-dir", sf, "--checkpoint-dir", str(tmp_path / "c2"), "--max-iter", "3"],
    )
    assert out_lp["n_labels"] >= 1 and out_lp["rows"] == 500
