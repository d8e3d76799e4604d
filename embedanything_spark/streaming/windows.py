"""Event-time streaming operators (beyond the reference — SURVEY.md
§2.10 notes the reference's "vector streaming" has no event-time
semantics; a 100 TB training-data pipeline does need them).

- ``windowed_counts``: watermarked tumbling-window aggregation over an
  event stream — late rows beyond the watermark are dropped by Spark's
  state store, the standard late-data contract.
- ``stateful_sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — per-user session assembly with a
  gap-timeout, the streaming analogue of the batch
  ``event_sessionize`` query (oracle-checked there). State is one
  (session_start, last_ts, n_events) tuple per user.

Both operate on the ``events`` schema
(event_id, user_id, event_type, value, ts) and are exercised by
tests/test_streaming_windows.py with file sources + availableNow
triggers (the deterministic harness pattern used across tests/).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = ("event_id long, user_id long, event_type string, "
                "value double, ts timestamp")

SESSION_GAP_SEC = 1800


def windowed_counts(stream: DataFrame, watermark: str = "30 minutes",
                    window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type.
    Batch-equivalent of the oracle-checked ``event_tumbling_window``
    query; with a real stream the watermark bounds state and drops
    late rows."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "sum_value"))


_SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                   "session_end timestamp, n_events long")
_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(key, pdfs, state: GroupState):
    """Per-user gap-timeout sessionizer. Emits CLOSED sessions; the
    open session lives in state until the gap (or timeout) closes it.
    Timestamps are tracked as epoch microseconds in state."""
    (user_id,) = key
    rows = []
    if state.hasTimedOut:
        start, last, n = state.get
        rows.append((user_id, start, last, n))
        state.remove()
    else:
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(
                pdf["ts"].astype("datetime64[us]").astype("int64"))
        ts_us.sort()
        cur = state.get if state.exists else None
        gap = SESSION_GAP_SEC * 1_000_000
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > gap:
                rows.append((user_id, cur[0], cur[1], cur[2]))
                cur = (t, t, 1)
            else:
                cur = (cur[0], t, cur[2] + 1)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(SESSION_GAP_SEC * 1000)
    if rows:
        out = pd.DataFrame(rows, columns=["user_id", "session_start",
                                          "session_end", "n_events"])
        for c in ("session_start", "session_end"):
            out[c] = pd.to_datetime(out[c], unit="us")
        yield out


def stateful_sessionize(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user sessions closed after SESSION_GAP_SEC of inactivity."""
    return (stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn,
                outputStructType=_SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
