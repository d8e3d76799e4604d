"""Event-stream operators (batch form of the streaming semantics —
the same plans run under Structured Streaming with readStream +
watermark; see streaming/ingest.py).

Covers SURVEY.md §2.10: the reference's 'vector streaming' is a
bounded-buffer pipeline; here the event-time analogs are tumbling
windows and gap sessionization over the events table
(event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from embedanything_spark.operators.docops import load, micro


def event_tumbling_window(spark, sf_dir):
    """1-hour tumbling counts + value stats per event_type. The window
    key is integer epoch-hours (not a timestamp) so results hash
    identically across engines and session timezones."""
    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; string-cast the truncated hour so the group
    # key is wall-clock (timezone-free) in both engines
    hour_id = F.date_trunc("hour", F.col("ts")).cast("string")
    return (ev.groupBy(hour_id.alias("hour_id"), "event_type")
            .agg(F.count("*").alias("n"),
                 micro(F.avg("value")).alias("avg_value_micro"),
                 micro(F.sum("value")).alias("sum_value_micro")))


def rolling_window_avg(spark, sf_dir):
    """W1 rolling-window context (statistical.rs:217-231): each event's
    value vs the mean of the previous 5 events of the same user."""
    ev = load(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-5, -1))
    return (ev.select("user_id", "event_id",
                      F.avg("value").over(w).alias("prev_avg"))
            .select("user_id", "event_id",
                    micro(F.coalesce(F.col("prev_avg"), F.lit(-1.0)))
                    .alias("prev_avg_micro")))


def event_sessionize(spark, sf_dir):
    """Gap-based sessions (>30 min inactivity per user): session count
    and mean session length per user — lag + running-sum windows."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gaps: timestamps carry microseconds, so second-level
    # truncation is ambiguous across engines
    gaps = (ev.select("user_id", "ts", "event_id",
                      F.lag("ts").over(w).alias("prev_ts"))
            .withColumn("gap",
                        F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")))
    marked = gaps.select(
        "user_id", "ts", "event_id",
        F.when(F.col("gap").isNull() | (F.col("gap") > 1800 * 1000000), 1)
        .otherwise(0).alias("new_sess"))
    sess = marked.select(
        "user_id", "event_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"))
    per_sess = (sess.groupBy("user_id", "sess_id")
                .agg(F.count("*").alias("n_events")))
    return (per_sess.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 micro(F.avg("n_events")).alias("avg_events_micro")))
