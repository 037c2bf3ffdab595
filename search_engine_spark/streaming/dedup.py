"""Streaming exact deduplication: drop repeated turn content as it
arrives, before it reaches the index or a training sink.

The batch pipeline dedupes with a corpus-wide hash aggregation
(:mod:`..ops.dedup`); a stream cannot hold "all fingerprints ever" in
state, so the streaming contract is bounded-window dedup:
``dropDuplicatesWithinWatermark`` keeps a fingerprint's state only
until the watermark passes its event time plus the delay, giving
O(rows inside the watermark horizon) state at any stream length.
Duplicates farther apart than the horizon pass through — that is the
documented trade, and the batch exact-dedup (or the LSH near-dup
sweep) remains the periodic full-corpus pass; this operator exists to
keep the HIGH-FREQUENCY duplicates (retries, bot loops, re-sent
batches) out of the hot path cheaply.

The fingerprint is md5 of whitespace-normalized text — the same
``md5_fp`` the batch fingerprints/dedup operators key on, so stream
and batch agree on what "exact duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    transcripts: DataFrame,
    watermark_delay: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Input stream minus rows whose normalized-text fingerprint was
    already seen within the watermark horizon (first occurrence wins).
    Works on batch frames too (global dedup there — the horizon is
    the whole input)."""
    fp = F.md5(F.concat_ws(" ", F.split(F.col(text_col), r"\s+")))
    with_fp = transcripts.withColumn("_fp", fp)
    if with_fp.isStreaming:
        deduped = with_fp.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["_fp"]
        )
    else:
        deduped = with_fp.dropDuplicates(["_fp"])
    return deduped.drop("_fp")
