"""Deterministic dense doc_id assignment (the scalable zipWithIndex pattern)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from search_engine_spark.fixtures import golden_transcripts, synthetic_transcripts
from search_engine_spark.operators.docids import with_doc_ids


def test_golden_doc_ids(spark):
    df = with_doc_ids(golden_transcripts(spark))
    rows = df.select("conv_id", "turn_idx", "doc_id").orderBy("doc_id").collect()
    assert [(r["conv_id"], r["turn_idx"], r["doc_id"]) for r in rows] == [
        ("conv00000000", 0, 0),
        ("conv00000000", 1, 1),
        ("conv00000000", 2, 2),
        ("conv00000001", 0, 3),
        ("conv00000001", 1, 4),
    ]


def test_matches_global_row_number(spark):
    df = synthetic_transcripts(spark, n_convs=30, turns_per_conv=7)
    got = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in with_doc_ids(df).collect()
    }
    w = Window.orderBy("conv_id", "turn_idx")
    expected = {
        (r["conv_id"], r["turn_idx"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w) - 1).collect()
    }
    assert got == expected


def test_invariant_across_parallelism(spark):
    df1 = synthetic_transcripts(spark, n_convs=25, turns_per_conv=4, num_partitions=2)
    df8 = synthetic_transcripts(spark, n_convs=25, turns_per_conv=4, num_partitions=8)
    ids1 = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in with_doc_ids(df1, num_partitions=2).collect()
    }
    ids8 = {
        (r["conv_id"], r["turn_idx"]): r["doc_id"]
        for r in with_doc_ids(df8, num_partitions=8).collect()
    }
    assert ids1 == ids8
    assert sorted(ids1.values()) == list(range(100))


def test_synthetic_text_parallelism_invariant(spark):
    a = synthetic_transcripts(spark, 10, 3, num_partitions=1).collect()
    b = synthetic_transcripts(spark, 10, 3, num_partitions=6).collect()
    key = lambda r: (r["conv_id"], r["turn_idx"])  # noqa: E731
    assert sorted([(key(r), r["text"]) for r in a]) == sorted(
        [(key(r), r["text"]) for r in b]
    )
