"""Deterministic dense doc_id assignment at scale.

The reference derives doc ids from the position of a file in a sorted
listing (reference ``diskindex.py:159-160,176``; ``searchengine.py:27-31``).
At 10^12-turn scale a global ``row_number()`` window would funnel every
row through one partition, so we use the scalable two-pass pattern:

1. range-partition + sort within partitions on the ordering key,
2. count rows per partition (a tiny job: one long per partition),
3. add each partition's cumulative offset to a partition-local counter
   via ``mapInPandas`` (Arrow-batched, order-preserving).

The result is the exact dense rank in ``ORDER BY order_cols`` — it does
not depend on the (sampled) range boundaries, so ids are deterministic
across parallelism levels: required for rank-identity vs the reference
and for idempotent resume.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel

_PID = "__sg_pid"


def with_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` with a dense ``doc_id`` = rank in ``ORDER BY order_cols``.

    ``order_cols`` must be a unique key (true for (conv_id, turn_idx)),
    which makes the assignment total-order deterministic.
    """
    out, _total, _parted = with_doc_ids_counted(df, order_cols, num_partitions)
    return out


def with_doc_ids_counted(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
):
    """Like :func:`with_doc_ids`, but also returns the total row count
    (free — the offset pass already counts every partition) and the
    pinned intermediate so the caller can ``unpersist()`` it once the
    result is materialized."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    parted = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Pin the partitioning so the count pass and the id pass see the same
    # (sampled) range boundaries.
    parted.persist(StorageLevel.MEMORY_AND_DISK)

    counts = {
        r[_PID]: r["cnt"]
        for r in parted.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    # copy the field list — StructType.add would mutate df's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField("doc_id", LongType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        offset = None
        for pdf in batches:
            if len(pdf) and offset is None:
                offset = offsets[int(pdf[_PID].iloc[0])]
            pdf = pdf.drop(columns=[_PID])
            pdf["doc_id"] = np.arange(local, local + len(pdf), dtype=np.int64) + (offset or 0)
            local += len(pdf)
            yield pdf[out_cols]

    return parted.mapInPandas(assign, out_schema), running, parted
