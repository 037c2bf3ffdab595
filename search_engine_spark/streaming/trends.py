"""Streaming term-trend rates — the live counterpart of
:func:`search_engine_spark.simple.term_trends`.

Same operator, two execution modes from ONE definition: on a batch
DataFrame :func:`term_rates` is a plain windowed aggregation (backfill
/ oracle path); under ``readStream`` the identical plan becomes the
canonical watermark + tumbling-window aggregation — each (window,
term) row is emitted exactly once when the watermark closes the
window, and state stays O(open windows x terms) at any stream length
because closed-window state is dropped.

The per-turn term frequencies come from the shared in-projection HOF
core (:func:`search_engine_spark.simple.term_tf_pairs`): no token
explode, so the streaming stage's per-batch work is one narrow
projection plus the windowed partial agg.

Watermark discipline (same as :mod:`.percolate`): the watermark
belongs on the SOURCE stream, before any filter — event-time stats
are collected at the watermark node, and a post-filter watermark
would only advance on turns containing a query term, leaving windows
open forever on a quiet vocabulary. :func:`start_trend_stream` wires
this correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.simple import term_tf_pairs
from search_engine_spark.streaming.ingest import TRANSCRIPT_SCHEMA


def term_rates(
    turns: DataFrame,
    terms: list[str],
    window_duration: str = "5 minutes",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Windowed per-term occurrence counts: (window_start, window_end,
    term, n_turns, tf_sum) — the "is 'error' spiking right now?" feed.
    Pass ``watermark_delay`` only when ``turns`` is an unwatermarked
    stream; on a batch DataFrame the same plan just aggregates, so
    backfill and the live stream share one definition."""
    w = (
        turns.withWatermark(ts_col, watermark_delay)
        if watermark_delay is not None and turns.isStreaming
        else turns
    )
    return (
        w.select(
            F.col(ts_col),
            F.explode(term_tf_pairs(terms, text_col)).alias("p"),
        )
        .where(F.col("p.tf") > 0)
        .groupBy(
            F.window(ts_col, window_duration).alias("win"),
            F.col("p.term").alias("term"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("p.tf").cast("long").alias("tf_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "term",
            "n_turns",
            "tf_sum",
        )
    )


def start_trend_stream(
    spark: SparkSession,
    source_dir: str,
    terms: list[str],
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    schema: str = TRANSCRIPT_SCHEMA,
    available_now: bool = True,
):
    """Landing dir -> watermarked windowed term rates -> append-only
    parquet. Each window row is written exactly once when the
    watermark closes it; turns later than the watermark delay are
    dropped by design (the documented lateness contract)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)  # on the SOURCE: every
        # turn advances event time, so windows close on stream
        # progress, not only when a tracked term happens to appear
    )
    rates = term_rates(stream, terms, window_duration)
    writer = (
        rates.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
