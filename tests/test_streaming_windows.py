"""Event-time streaming: watermarked tumbling windows equal the batch
aggregation; the applyInPandasWithState sessionizer closes sessions at
the gap timeout and matches a pandas reference."""

import shutil
import tempfile
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from embedanything_spark.streaming.windows import (EVENT_SCHEMA,
                                                   SESSION_GAP_SEC,
                                                   stateful_sessionize,
                                                   windowed_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """events table staged as a streaming file source."""
    d = tempfile.mkdtemp(prefix="ea_events_src_")
    (spark.read.parquet(f"{SF_DIR}/events.parquet")
     .select("event_id", "user_id", "event_type", "value", "ts")
     .coalesce(2).write.mode("overwrite").parquet(d))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(spark, stream_df, name, mode):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix=f"ea_ckpt_{name}_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_windowed_counts_match_batch(spark, events_dir):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    got = _drain(spark, windowed_counts(stream), "win_counts", "append")
    batch = (spark.read.parquet(events_dir)
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
             .select(F.col("w.start").alias("window_start"),
                     "event_type", "n", "s").toPandas())
    # append mode emits only windows CLOSED by the watermark; windows
    # still open at end-of-stream are withheld — compare that subset
    max_ts = pd.read_parquet(f"{events_dir}")["ts"].max()
    horizon = max_ts - pd.Timedelta(minutes=30)
    batch = batch[batch["window_start"] +
                  pd.Timedelta(hours=1) <= horizon]
    k = ["window_start", "event_type"]
    got = got.sort_values(k).reset_index(drop=True)
    batch = batch.sort_values(k).reset_index(drop=True)
    assert len(batch) > 0
    merged = got.merge(batch, on=k, how="right")
    assert not merged["n_x"].isna().any()  # every closed window emitted
    assert (merged["n_x"].to_numpy() == merged["n_y"].to_numpy()).all()
    assert merged["sum_value"].to_numpy() == pytest.approx(
        merged["s"].to_numpy(), rel=1e-9)


def test_stateful_sessionize(spark, events_dir):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    got = _drain(spark, stateful_sessionize(stream), "sessions",
                 "append")
    # pandas reference: gap-based sessionization per user; the stream
    # emits only CLOSED sessions (each user's last session stays open
    # in state), so expect exactly sessions_ref minus one per user
    ev = pd.read_parquet(Path(SF_DIR) / "events.parquet")
    ref_closed = 0
    per_user_sessions = {}
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].sort_values().astype("datetime64[us]")
        gaps = ts.diff().dt.total_seconds().fillna(1e12)
        n_sessions = int((gaps > SESSION_GAP_SEC).sum())
        per_user_sessions[uid] = n_sessions
        ref_closed += n_sessions - 1  # last one remains open
    assert len(got) == ref_closed
    if len(got):
        assert (got["session_end"] >= got["session_start"]).all()
        assert (got["n_events"] >= 1).all()


def test_late_rows_dropped(spark, tmp_path):
    """Watermark semantics with genuinely LATE data: batch 1 advances
    the watermark past window 0, batch 2 confirms it (Spark filters
    late input against the PREVIOUS batch's watermark), batch 3
    carries an event for the closed window → dropped, not re-opened
    (maxFilesPerTrigger=1 makes each file its own micro-batch; mtimes
    pin the order)."""
    import os
    import time as _time

    import pandas as pd

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2026-01-01 00:00:00")

    def mk(eid, mins, val):
        return dict(event_id=eid, user_id=1, event_type="a", value=val,
                    ts=base + pd.Timedelta(minutes=mins))

    files = {
        # window 0 rows + a 02:00 event → watermark 01:30 > window end
        "f1": [mk(1, 10, 1.0), mk(2, 20, 1.0), mk(3, 120, 1.0)],
        "f2": [mk(4, 130, 1.0)],                  # watermark holds
        "f3": [mk(5, 30, 100.0), mk(6, 140, 1.0)],  # 5 is LATE
    }
    now = _time.time()
    for i, (name, rows) in enumerate(files.items()):
        (spark.createDataFrame(pd.DataFrame(rows)).coalesce(1)
         .write.mode("overwrite").parquet(str(src / name)))
        for p in (src / name).glob("*.parquet"):
            os.utime(p, (now - 3600 + i * 60, now - 3600 + i * 60))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*/"))
    q = (windowed_counts(stream).writeStream.format("memory")
         .queryName("late_win").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    dropped = sum(p["stateOperators"][0]["numRowsDroppedByWatermark"]
                  for p in q.recentProgress if p["stateOperators"])
    got = spark.table("late_win").toPandas()
    w0 = got[got["window_start"] == base]
    # window 0 closed with ONLY the on-time rows: n=2, sum=2.0 — the
    # late value=100 row was dropped by the watermark
    assert dropped == 1
    assert len(w0) == 1
    assert int(w0.iloc[0]["n"]) == 2
    assert float(w0.iloc[0]["sum_value"]) == 2.0
