"""Streaming sessionization — a CUSTOM STATEFUL operator via
``applyInPandasWithState``.

The batch twin (:mod:`..ops.sessions`) numbers sessions with one
window pass; under a stream the operator must instead REMEMBER each
user's open session across micro-batches and close it either when a
later event proves the gap or when event time moves past the gap with
no event at all (an idle user's last session must still close). That
is exactly the per-group mutable state + event-time timeout contract
``applyInPandasWithState`` exists for:

* state per user: (next session_seq, open session's start/last/count),
  a 4-field tuple — O(users) state total, independent of stream length;
* each batch's rows are gap-split VECTORIZED in numpy; every session
  CLOSED inside the batch (a later in-batch event proves its gap) is
  emitted immediately and exactly once;
* the still-open tail session arms an event-time timeout at
  ``last_ts + gap``: when the WATERMARK (set on the source stream)
  passes it, Spark calls the function once more with
  ``state.hasTimedOut`` and the session closes with no triggering
  event — the piece no stateless plan can express;
* a timeout that is already due (``last_ts + gap <= watermark``)
  closes inline, because Spark rejects arming a timeout at or before
  the current watermark.

Emitted rows match the batch operator's session boundaries exactly —
``tests/test_streaming.py`` pins streaming-vs-batch agreement across
multiple triggers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_seq int, session_start timestamp, "
    "session_end timestamp, n_events long"
)
STATE_SCHEMA = "seq int, start long, last long, n long"  # long = epoch us


def _sessionizer(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def close(user_id: int, seq: int, start_us: int, last_us: int, n: int):
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_seq": [seq],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )

    def func(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            seq, start, last, n = state.get
            state.remove()
            yield close(user_id, seq, start, last, n)
            return
        # gather + order this batch's events (micro-batches are not
        # intra-group ordered)
        ts_parts = [
            pd.to_datetime(pdf["ts"]).astype("int64").to_numpy() // 1_000
            for pdf in pdfs
        ]
        us = np.sort(np.concatenate(ts_parts)) if ts_parts else np.empty(0, np.int64)
        if us.size == 0:
            return
        if state.exists:
            seq, start, last, n = state.get
        else:
            seq, start, last, n = 1, int(us[0]), int(us[0]) - gap_us - 1, 0
        out = []
        for t in _split_runs(us, int(last), gap_us):
            # t = (first_us, last_us, count) of one gap-delimited run
            if n and t[0] - last > gap_us:
                out.append(close(user_id, seq, start, last, n))
                seq, start, n = seq + 1, t[0], 0
            elif not n:
                start = t[0]
            last, n = t[1], n + t[2]
        state.update((seq, int(start), int(last), int(n)))
        # arm the event-time timeout; if the watermark already passed
        # it, close inline (Spark rejects a timeout <= watermark)
        due_ms = (last + gap_us) // 1_000 + 1
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms >= due_ms:
            state.remove()
            out.append(close(user_id, seq, start, last, n))
        else:
            state.setTimeoutTimestamp(due_ms)
        yield from out

    return func


def _split_runs(us: np.ndarray, prev_last: int, gap_us: int):
    """Yield (first, last, count) per gap-delimited run of sorted
    timestamps — vectorized boundary detection, no per-event Python."""
    prev = np.concatenate(([prev_last], us[:-1]))
    starts = np.flatnonzero((us - prev) > gap_us)
    bounds = np.concatenate(([0], starts, [us.size])) if (starts.size == 0 or starts[0] != 0) else np.concatenate((starts, [us.size]))
    bounds = np.unique(bounds)
    for i in range(bounds.size - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        yield (int(us[lo]), int(us[hi - 1]), hi - lo)


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Closed sessions (user_id, session_seq, session_start,
    session_end, n_events) from a streaming events frame — emitted
    exactly once, either when a later event proves the gap or when the
    watermark times the idle session out. Streaming only (Spark
    rejects ``applyInPandasWithState`` on batch frames); batch
    backfill is :func:`..ops.sessions.session_stats`, whose boundaries
    this operator reproduces exactly (pinned by test)."""
    src = events.withWatermark(ts_col, watermark_delay)
    return src.groupBy(user_col).applyInPandasWithState(
        _sessionizer(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
