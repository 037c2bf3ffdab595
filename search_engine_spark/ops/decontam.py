"""Benchmark decontamination: flag training docs that share word
k-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (the GPT-3 appendix-C /
FineWeb-style n-gram overlap check): any training document containing a
k-gram that also appears in a benchmark document is suspect — exact
containment, no similarity threshold, so recall is total at the chosen
``k``.

Scale shape: the benchmark side is an eval set — thousands of docs, not
billions — so its distinct-shingle table is broadcast and the whole
check is ONE map-side semi-join over the training shingles (no shuffle
of the 100 TB side beyond the per-doc aggregation). With
``broadcast_benchmark=False`` it degrades to a shuffle join for
benchmark sets too large to broadcast; hot boilerplate shingles then
fan out, which ``max_shingle_df`` (dropping shingles above that
document frequency *in the benchmark*) bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops import dedup

DEFAULT_K = dedup.DEFAULT_SHINGLE_K


def benchmark_shingles(
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Distinct benchmark shingles: (shingle). ``max_shingle_df`` drops
    shingles appearing in more than that many benchmark docs
    (boilerplate — matching them flags everything, signal-free)."""
    sh = dedup.shingles(benchmark, text_col, "doc_id", k)
    if max_shingle_df is None:
        return sh.select("shingle").distinct()
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("bdf"))
        .where(F.col("bdf") <= max_shingle_df)
        .select("shingle")
    )


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    max_shingle_df: int | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-training-doc contamination report:
    (id, n_shingles, n_contaminated, contamination_frac, contaminated).

    ``contamination_frac`` = contaminated / total distinct shingles of
    the doc, rounded to 6 places (cross-engine comparable); docs with
    zero overlap appear with ``contaminated = false``.
    """
    bench_sh = benchmark_shingles(benchmark, text_col, k, max_shingle_df)
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    train_sh = dedup.shingles(train, text_col, id_col, k)
    totals = train_sh.groupBy(id_col).agg(
        F.count("*").alias("n_shingles")  # shingles() is already distinct
    )
    hits = (
        train_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            n_cont.alias("n_contaminated"),
            F.round(n_cont / F.col("n_shingles"), 6).alias(
                "contamination_frac"
            ),
            (n_cont > 0).alias("contaminated"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    max_frac: float = 0.0,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Training rows surviving the check: docs whose contamination_frac
    exceeds ``max_frac`` are dropped (0.0 = any overlap drops)."""
    report = contamination(
        train, benchmark, text_col, id_col, k, max_shingle_df
    )
    keep = report.where(
        F.col("contamination_frac") <= F.lit(max_frac)
    ).select(id_col)
    return train.join(keep, id_col, "left_semi")
