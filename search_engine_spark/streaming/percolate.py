"""Standing-query percolation: match the turn stream against saved
queries as it arrives.

The reference engine answers ad-hoc queries against a static index;
the streaming dual ("percolation") registers the QUERIES and evaluates
every NEW document against them — alerting, routing, and live-dashboard
feeds over a transcript firehose. There is no index lookup at all:
each incoming turn is analyzed once (the same Arrow analyzer the index
build runs, so a percolated match is exactly an index-then-query match)
and tested against the compiled query set inline.

Execution is STATELESS — analyze (Arrow UDF) -> explode the broadcast
query table -> codegen'd subset predicate — so it runs identically on
a batch DataFrame and under ``readStream`` in append mode with no
watermark or state store. Cost is O(turns x standing queries) behind
whole-stage codegen, the right trade for the alerting regime (tens to
hundreds of standing queries); beyond that, invert it (term -> query_id
broadcast join + count-distinct against each query's term count) —
the shape :func:`percolate_inverted` provides.

Each standing query is an AND of words, normalized exactly like index
queries (Porter2 via ``query_normalize``); wildcards/phrases are not
supported here (they need the index's kgram/positions tables — register
those as ad-hoc queries against the continuously-ingested index
instead, ``streaming/ingest.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.streaming.ingest import TRANSCRIPT_SCHEMA
from search_engine_spark.text.normalize import query_normalize


def compile_queries(queries: dict[int, str]) -> list[tuple[int, list[str]]]:
    """(query_id, sorted distinct stems) per standing query; a query
    with no indexable term compiles away (it can never match)."""
    out = []
    for qid, q in sorted(queries.items()):
        stems = sorted({query_normalize(w) for w in q.split()} - {""})
        if stems:
            out.append((int(qid), stems))
    return out


def _term_set(text_col: str):
    """Distinct stem set of one turn — the same Arrow analyzer the
    index build uses (``functions/udfs.py``), so percolation matches
    exactly what a later index-then-boolean-query would."""
    from search_engine_spark.functions.udfs import analyze_udf

    return F.array_distinct(
        F.transform(analyze_udf(F.col(text_col)), lambda t: t["term"])
    )


def percolate(
    transcripts: DataFrame,
    queries: dict[int, str],
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, turn_idx, ts, query_id) for every (turn, standing
    query) pair where the turn contains ALL the query's stems.

    Works on batch and streaming DataFrames alike (stateless plan:
    projection -> explode of a literal query array -> filter)."""
    compiled = compile_queries(queries)
    spark = transcripts.sparkSession
    if not compiled:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, ts timestamp, query_id int"
        ).limit(0)
    qarr = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.array(*[F.lit(t) for t in stems]).alias("qterms"),
            )
            for qid, stems in compiled
        ]
    )
    return (
        transcripts.select(
            "conv_id", "turn_idx", "ts", _term_set(text_col).alias("_terms")
        )
        .select("conv_id", "turn_idx", "ts", "_terms", F.explode(qarr).alias("q"))
        .where(
            F.forall(
                F.col("q.qterms"),
                lambda t: F.array_contains(F.col("_terms"), t),
            )
        )
        .select("conv_id", "turn_idx", "ts", F.col("q.query_id").alias("query_id"))
    )


def percolate_inverted(
    transcripts: DataFrame,
    queries: dict[int, str],
    text_col: str = "text",
) -> DataFrame:
    """:func:`percolate` for LARGE standing-query sets: terms are
    exploded once per turn and joined against a broadcast (term ->
    query_id) table, then a count-distinct per (turn, query) checks the
    AND — O(turn terms x avg queries per term) instead of O(turns x
    queries). Batch-only (the aggregation needs complete groups; under
    streaming use it inside ``foreachBatch``)."""
    compiled = compile_queries(queries)
    spark = transcripts.sparkSession
    if not compiled:
        return spark.createDataFrame(
            [], "conv_id string, turn_idx int, ts timestamp, query_id int"
        ).limit(0)
    qdf = spark.createDataFrame(
        [(qid, t, len(stems)) for qid, stems in compiled for t in stems],
        "query_id int, term string, n_terms int",
    )
    hits = (
        transcripts.select(
            "conv_id", "turn_idx", "ts", F.explode(_term_set(text_col)).alias("term")
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("conv_id", "turn_idx", "ts", "query_id", "n_terms")
        .agg(F.count_distinct("term").alias("nt"))
        .where(F.col("nt") == F.col("n_terms"))
    )
    return hits.select("conv_id", "turn_idx", "ts", "query_id")


def start_percolator(
    spark: SparkSession,
    source_dir: str,
    queries: dict[int, str],
    output_dir: str,
    checkpoint_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    available_now: bool = True,
):
    """Continuously percolate a landing directory of transcript parquet
    into an append-only parquet feed of (conv_id, turn_idx, ts,
    query_id) matches. Stateless append mode: exactly-once comes from
    Structured Streaming's file-sink transaction log alone — no
    foreachBatch, no custom fencing needed. Returns the
    ``StreamingQuery`` handle."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    writer = (
        percolate(stream, queries)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def alert_rates(
    matches: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Windowed alert counts per standing query: (window_start,
    window_end, query_id, n_matches) — the live-dashboard rate feed on
    top of :func:`percolate`'s match stream.

    Under ``readStream`` this is the canonical watermark + windowed
    aggregation: the watermark bounds how late a turn may arrive and
    still count (state for a window is dropped once the watermark
    passes its end, so state size stays O(open windows x queries) at
    any stream length), and append mode emits each window exactly once
    when it closes. IMPORTANT: the watermark belongs on the SOURCE
    stream, before percolation filters it (``start_alert_stream`` does
    this) — event-time stats are collected at the watermark node, and
    a post-filter watermark would only advance on MATCHING turns,
    leaving a quiet query's windows open forever. Pass
    ``watermark_delay`` only when ``matches`` is an unwatermarked
    stream. On a batch DataFrame the same plan just aggregates, so
    batch backfill and the live stream share one definition.
    """
    w = (
        matches.withWatermark(ts_col, watermark_delay)
        if watermark_delay is not None and matches.isStreaming
        else matches
    )
    return (
        w.groupBy(F.window(ts_col, window_duration).alias("win"), "query_id")
        .agg(F.count("*").cast("long").alias("n_matches"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "query_id",
            "n_matches",
        )
    )


def start_alert_stream(
    spark: SparkSession,
    source_dir: str,
    queries: dict[int, str],
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    schema: str = TRANSCRIPT_SCHEMA,
    available_now: bool = True,
):
    """Landing dir -> percolate -> watermarked windowed counts ->
    append-only parquet. Each window row is written exactly once, when
    the watermark closes the window; turns later than the watermark
    delay are dropped by design (the documented lateness contract)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark_delay)  # BEFORE the filter: every
        # turn advances event time, so windows close on stream progress,
        # not only when a query happens to match (alert_rates docstring)
    )
    rates = alert_rates(percolate(stream, queries), window_duration)
    writer = (
        rates.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
