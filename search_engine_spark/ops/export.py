"""Training-data export: curated rows out as sharded, compressed
JSONL — the sink end of the curate -> dedup -> pack pipeline.

Trainer data loaders want many similar-sized compressed shards, not
one giant file and not a million tiny ones. Shard sizing here is
declarative: ``maxRecordsPerFile`` bounds rows per shard (the writer
rolls files without an extra shuffle), and an optional
``repartition(n)`` spreads rows when the upstream partitioning is
skewed or too narrow. Rows are written deterministically ordered
WITHIN each shard when ``order_col`` is given (``sortWithinPartitions``
— a local sort, no exchange), so re-runs produce byte-stable shards
for a fixed partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    num_partitions: int | None = None,
    order_col: str | None = None,
    compression: str = "gzip",
) -> int:
    """Write ``df`` as compressed JSONL shards under ``path``; returns
    the row count written (via the write job's own Observation — no
    read-back scan)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    out = df
    if num_partitions is not None:
        out = out.repartition(num_partitions)
    if order_col is not None:
        out = out.sortWithinPartitions(order_col)
    obs = Observation("export_rows")
    (
        out.observe(obs, F.count(F.lit(1)).alias("rows"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .json(path)
    )
    return int(obs.get["rows"])


def conversation_threads(turns: DataFrame) -> DataFrame:
    """Assemble transcript turns into per-conversation training samples
    (the SFT/chat-format assembly step): one row per conversation with

    * ``thread``     — turns in ``turn_idx`` order rendered as
      ``"role: text"`` lines joined by newlines (the flat chat-template
      form a tokenizer consumes),
    * ``thread_md5`` — content fingerprint of the rendered thread
      (conversation-level exact-dedup key — feed to
      :func:`..dedup.exact_duplicates`-style grouping to drop repeated
      conversations wholesale),
    * ``n_turns`` / ``n_tokens`` — length accounting for packing and
      budget decisions.

    One shuffle on ``conv_id`` (partial-agg'd collect_list, merged
    per conversation); determinism does not depend on arrival order
    because the collected (turn_idx, role, text) structs are
    ``sort_array``-ed before rendering. Conversations are bounded
    (thousands of turns, not billions), so per-group state stays
    small at any corpus scale; skew would come only from a degenerate
    single-conversation corpus.
    """
    from pyspark.sql import functions as F

    ntok = F.size(F.split(F.col("text"), r"\s+"))
    agg = (
        turns.select("conv_id", "turn_idx", "role", "text", ntok.alias("ntok"))
        .groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text"))
            ).alias("ts"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    thread = F.array_join(
        F.transform(
            F.col("ts"),
            lambda s: F.concat_ws(": ", s["role"], s["text"]),
        ),
        "\n",
    )
    return agg.select(
        "conv_id",
        "n_turns",
        "n_tokens",
        thread.alias("thread"),
        F.md5(thread).alias("thread_md5"),
    )
