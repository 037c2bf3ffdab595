"""Sessionization: split per-user event streams into sessions at
inactivity gaps, plus per-session rollups.

The transcript/events side of a training-data platform needs activity
sessions (agent-run segmentation, engagement analytics, rate-limit
forensics) the same way the text side needs dedup. The gap rule is the
classic one: a new session starts at the first event, or whenever the
time since the user's previous event exceeds ``gap``.

Execution shape at 10^12 events: ONE shuffle — the window's hash
partitioning by user — carries both the lag() that finds the breaks
and the running sum that numbers the sessions; the per-session rollup
groups on (user_id, session_seq), which Spark satisfies from the same
partitioning (no second exchange). A pathologically hot user's events
must colocate for the window (inherent to the semantics); cap or
pre-split such users upstream if one user exceeds a partition.

Timestamps are compared in exact integer MICROSECONDS
(``unix_micros``), so the DuckDB oracle (``epoch_us``) reproduces the
session boundaries bit-for-bit — no float time arithmetic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Input events + (session_seq, session_start): ``session_seq`` is
    the user's 1-based session number; ``session_start`` flags the
    event that opened the session. Ordering inside a user is (ts,
    tiebreak) so duplicate timestamps stay deterministic."""
    # cast covers TIMESTAMP_NTZ inputs; the offset a timezone
    # interpretation adds is uniform and cancels in every difference
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us, F.col(order_tiebreak))
    prev = F.lag(us).over(w)
    is_new = prev.isNull() | (us - prev > gap_minutes * 60 * 1_000_000)
    running = Window.partitionBy(user_col).orderBy(
        us, F.col(order_tiebreak)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "*",
        F.sum(is_new.cast("int")).over(running).cast("int").alias("session_seq"),
        is_new.alias("session_start"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """One row per session: (user_id, session_seq, n_events,
    duration_secs, total_value). Groups on the sessionize window's own
    partitioning key prefix, so the rollup adds no extra shuffle."""
    s = sessionize(events, gap_minutes, user_col, ts_col)
    # cast covers TIMESTAMP_NTZ inputs; the offset a timezone
    # interpretation adds is uniform and cancels in every difference
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count("*").cast("long").alias("n_events"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000.0)).alias("duration_secs"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("total_value"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)


def rolling_activity(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Input events + ``n_trailing``: how many events this user emitted
    in the trailing ``days`` window INCLUDING this one — burst/abuse
    detection and engagement features. A RANGE-frame window over exact
    integer microseconds: the same single user-partitioned shuffle as
    :func:`sessionize`, with Spark maintaining the sliding frame in one
    pass per partition (no self-join, no per-event scan)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = days * 86_400 * 1_000_000
    w = (
        Window.partitionBy(user_col)
        .orderBy(us)
        .rangeBetween(-span, Window.currentRow)
    )
    return events.select(
        "*", F.count("*").over(w).cast("long").alias("n_trailing")
    )


def value_quantiles(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-group value quantiles (p50/p95/p99 …), linear interpolation.

    Uses EXACT ``percentile`` — one shuffle, but the final aggregation
    buffers each group's values, which is fine for bounded-cardinality
    metric columns and oracle checking. For a 10^12-event column swap
    in ``approx_percentile(value, p, accuracy)`` (t-digest-style
    mergeable sketch, bounded memory, same plan shape) and accept the
    documented error bound — the approximation is the scale path, the
    exact form is the verifiable one.
    """
    aggs = [
        F.round(
            F.expr(f"percentile({value_col}, {p})"), 6
        ).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return events.groupBy(group_col).agg(*aggs)
