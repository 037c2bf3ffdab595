"""Continuous index ingestion via Structured Streaming.

The reference engine is batch-only (its Spimi rebuilds from zero,
``diskindex.py:130-135``); a transcript corpus at 10^12-turn scale is
append-only and always growing, so the Spark-native shape is a
``readStream`` over the landing table/directory feeding
``IndexBuilder.append`` through ``foreachBatch``: each micro-batch
becomes one committed, block-aligned index chunk.

Exactly-once discipline: Structured Streaming's checkpoint guarantees
each source file lands in exactly one batch_id, but ``foreachBatch``
may RE-RUN a batch after a crash between the append and the stream
commit. ``append`` is not idempotent (a replay would re-index the
batch under fresh doc ids), so the handler records the last committed
batch_id inside the index directory (atomic rename, same discipline as
the chunk manifests) and skips any batch at or below it — replays
become no-ops and the index is exactly-once with respect to the
stream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.build import IndexBuilder

# The transcript landing schema (BASELINE.json input_hint). A schema is
# mandatory for file-source streams — streaming readers never infer.
TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_STATE_FILE = "_stream_state.json"


def _last_committed_batch(index_dir: str) -> int:
    path = os.path.join(index_dir, _STATE_FILE)
    if not os.path.exists(path):
        return -1
    with open(path) as f:
        return json.load(f)["batch_id"]


def _commit_batch(index_dir: str, batch_id: int) -> None:
    path = os.path.join(index_dir, _STATE_FILE)
    with open(path + ".tmp", "w") as f:
        json.dump({"batch_id": batch_id}, f)
    os.replace(path + ".tmp", path)


def index_batch(
    builder: IndexBuilder, batch_df: DataFrame, batch_id: int
) -> dict | None:
    """Index one micro-batch: first batch builds, later ones append;
    replayed batch_ids are skipped (see module docstring)."""
    index_dir = builder.index_dir
    if batch_id <= _last_committed_batch(index_dir):
        return None
    if batch_df.isEmpty():
        _commit_batch(index_dir, batch_id)
        return None
    if os.path.exists(os.path.join(index_dir, "_meta.json")):
        info = builder.append(batch_df)
    else:
        info = builder.build(batch_df)
    _commit_batch(index_dir, batch_id)
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
    one giant one.
    """
    builder = IndexBuilder(spark, index_dir, **builder_kwargs)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    writer = stream.writeStream.foreachBatch(
        lambda df, bid: index_batch(builder, df, bid) and None
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
