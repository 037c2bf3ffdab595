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
