"""Continuous index ingestion via Structured Streaming.

The reference engine is batch-only (its Spimi rebuilds from zero,
``diskindex.py:130-135``); a transcript corpus at 10^12-turn scale is
append-only and always growing, so the Spark-native shape is a
``readStream`` over the landing table/directory feeding
``IndexBuilder.append`` through ``foreachBatch``: each micro-batch
becomes one committed, block-aligned index chunk.

Exactly-once discipline: Structured Streaming's checkpoint guarantees
each source file lands in exactly one batch_id, but ``foreachBatch``
may RE-RUN a batch after a crash anywhere before the stream commit.
Replays are fenced at TWO levels, both keyed by the stream's LINEAGE
(the checkpoint location — restarting against a new checkpoint
renumbers batches from 0, so a bare batch_id would wrongly skip
genuinely new data):

1. ``_stream_state.json`` in the index dir (fast path, atomic rename)
   records the last committed (lineage, batch_id);
2. the (lineage, batch_id) is passed into ``IndexBuilder.append`` as
   ingest provenance — it lands in the chunk manifest and ``_meta.json``
   at the append's OWN commit point, so a crash between the append
   commit and (1) still skips the replay (``build.py::append``), and a
   crash *inside* the append is rolled forward/past by its recovery
   protocol (orphan probe + manifest replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark import fsio
from search_engine_spark.build import IndexBuilder

# The transcript landing schema (BASELINE.json input_hint). A schema is
# mandatory for file-source streams — streaming readers never infer.
TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_STATE_FILE = "_stream_state.json"


def _last_committed_batch(spark, index_dir: str, lineage: str) -> int:
    path = fsio.join(index_dir, _STATE_FILE)
    if not fsio.exists(spark, path):
        return -1
    state = fsio.read_json(spark, path)
    if state.get("lineage") != lineage:
        return -1  # different checkpoint → different batch numbering
    return state["batch_id"]


def _commit_batch(spark, index_dir: str, lineage: str, batch_id: int) -> None:
    fsio.write_json_atomic(
        spark,
        fsio.join(index_dir, _STATE_FILE),
        {"lineage": lineage, "batch_id": batch_id},
    )


def index_batch(
    builder: IndexBuilder,
    batch_df: DataFrame,
    batch_id: int,
    lineage: str = "",
) -> dict | None:
    """Index one micro-batch: first batch builds, later ones append;
    replayed (lineage, batch_id) pairs are skipped (module docstring)."""
    spark = builder.spark
    index_dir = builder.index_dir
    if batch_id <= _last_committed_batch(spark, index_dir, lineage):
        return None
    if batch_df.isEmpty():
        _commit_batch(spark, index_dir, lineage, batch_id)
        return None
    ingest = {"lineage": lineage, "batch_id": batch_id}
    if fsio.exists(spark, fsio.join(index_dir, "_meta.json")):
        info = builder.append(batch_df, ingest=ingest)
        if info.get("skipped"):
            info = None
    else:
        # provenance lands in the build's own atomic meta commit, so a
        # replay of batch 0 cannot be re-indexed as an append
        info = builder.build(batch_df, ingest=ingest)
    _commit_batch(spark, index_dir, lineage, batch_id)
    return info


def start_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = TRANSCRIPT_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    **builder_kwargs,
):
    """Start a streaming query that keeps the index current with a
    landing directory of transcript parquet files.

    ``available_now=True`` drains everything present and stops (the
    batch-refresh / test mode); ``False`` runs continuously. The
    returned ``StreamingQuery`` is the handle (``awaitTermination`` /
    ``stop``). ``max_files_per_trigger`` bounds micro-batch size so an
    initial backlog becomes several block-aligned chunks instead of
    one giant one. The checkpoint location doubles as the replay
    lineage key (module docstring).
    """
    builder = IndexBuilder(spark, index_dir, **builder_kwargs)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    writer = stream.writeStream.foreachBatch(
        lambda df, bid: index_batch(builder, df, bid, lineage=checkpoint_dir)
        and None
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
