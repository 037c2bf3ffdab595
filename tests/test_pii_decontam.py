"""Unit tests for ops/pii.py and ops/decontam.py (hand-computed
expectations; the DuckDB cross-engine check lives in the contract)."""

from pyspark.sql import functions as F

from search_engine_spark.ops import decontam, pii


def _pii_df(spark):
    rows = [
        (0, "reach me at alice@example.com or bob.smith@mail.co today"),
        (1, "ssn 123-45-6789 card 4111111111111111 done"),
        (2, "call (555) 123-4567 or 555-987-6543 from 10.0.0.1"),
        (3, "no sensitive content here at all"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in pii.pii_counts(_pii_df(spark)).collect()
    }
    assert out[0]["n_email"] == 2 and out[0]["n_pii"] == 2
    assert out[1]["n_ssn"] == 1 and out[1]["n_longnum"] == 1
    assert out[2]["n_phone"] == 2 and out[2]["n_ipv4"] == 1
    assert out[3]["n_pii"] == 0 and out[3]["has_pii"] is False
    assert out[1]["has_pii"] is True


def test_redact_order_and_placeholders(spark):
    out = {
        r["doc_id"]: r["redacted"]
        for r in pii.redact_pii(_pii_df(spark)).collect()
    }
    assert out[0] == "reach me at <EMAIL> or <EMAIL> today"
    # the SSN must be redacted as an SSN, not swallowed by <NUMBER>
    assert out[1] == "ssn <SSN> card <NUMBER> done"
    assert out[2] == "call <PHONE> or <PHONE> from <IP>"
    assert out[3] == "no sensitive content here at all"


def test_pii_counts_is_single_projection(spark):
    plan = pii.pii_counts(_pii_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: per-row projection only


def _contam_dfs(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap"),
            (3, "quick brown fox appears here too"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], ["doc_id", "text"]
    )
    return train, bench


def test_contamination_report(spark):
    train, bench = _contam_dfs(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in decontam.contamination(train, bench).collect()
    }
    # doc 1: shingles "the quick brown" + "quick brown fox" shared
    assert out[1]["n_contaminated"] == 2 and out[1]["contaminated"] is True
    assert out[1]["n_shingles"] == 7
    assert out[2]["n_contaminated"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_contaminated"] == 1  # "quick brown fox"
    assert abs(out[1]["contamination_frac"] - round(2 / 7, 6)) < 1e-12


def test_decontaminate_drops_flagged(spark):
    train, bench = _contam_dfs(spark)
    kept = sorted(
        r["doc_id"] for r in decontam.decontaminate(train, bench).collect()
    )
    assert kept == [2]
    # tolerant threshold keeps the lightly-contaminated doc
    kept_loose = sorted(
        r["doc_id"]
        for r in decontam.decontaminate(train, bench, max_frac=0.26).collect()
    )
    assert kept_loose == [2, 3]


def test_benchmark_side_is_broadcast(spark):
    train, bench = _contam_dfs(spark)
    plan = (
        decontam.contamination(train, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_hot_shingle_cap(spark):
    bench = spark.createDataFrame(
        [(i, "common boilerplate line here") for i in range(5)],
        ["doc_id", "text"],
    )
    assert decontam.benchmark_shingles(bench, max_shingle_df=4).count() == 0
    assert decontam.benchmark_shingles(bench, max_shingle_df=5).count() > 0
