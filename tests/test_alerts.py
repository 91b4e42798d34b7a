"""Hysteresis threshold alerting: batch gaps-and-islands form, streaming
GroupState form, and their parity on the events fixture."""

from __future__ import annotations

import pytest

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from hnsw_spark.streaming.alerts import stream_threshold_alerts, threshold_alerts

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)

_SCHEMA = "event_type string, event_id long, ts timestamp_ntz, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (k, i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v)
            for k, i, t, v in rows
        ],
        _SCHEMA,
    )


def test_batch_hysteresis_does_not_flap(spark):
    """A dip between low and high must NOT close the alert; only <= low
    does."""
    rows = [
        ("a", 1, 0, 10.0),    # below: idle
        ("a", 2, 10, 200.0),  # >= high: open ep.1
        ("a", 3, 20, 80.0),   # between: stays open (no flap)
        ("a", 4, 30, 180.0),  # still open, new peak candidate
        ("a", 5, 40, 40.0),   # <= low: close ep.1
        ("a", 6, 50, 160.0),  # open ep.2, never closes
    ]
    out = {
        r.episode: r
        for r in threshold_alerts(_ev(spark, rows), high=150, low=50).collect()
    }
    assert set(out) == {1, 2}
    ep1 = out[1]
    assert ep1.n_events == 3 and ep1.peak_value == 200.0
    assert ep1.alert_start == dt.datetime(2024, 1, 1, 0, 0, 10)
    assert ep1.alert_end == dt.datetime(2024, 1, 1, 0, 0, 40)
    ep2 = out[2]
    assert ep2.alert_end is None and ep2.n_events == 1


def _land(spark, src_dir, name, df, mtime):
    import glob
    import shutil

    tmp = os.path.join(src_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.makedirs(src_dir, exist_ok=True)
    dest = os.path.join(src_dir, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def test_alert_closes_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "alert_events")
    base = time.time() - 1000
    _land(spark, src, "f1", _ev(spark, [("a", 1, 0, 300.0), ("a", 2, 10, 90.0)]), base)
    _land(spark, src, "f2", _ev(spark, [("a", 3, 20, 20.0), ("a", 4, 30, 250.0)]), base + 10)

    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_threshold_alerts(stream, high=150, low=50)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("alerts")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from alerts").collect()
    finally:
        q.stop()
    # the alert opened in batch 1 closes in batch 2; the batch-2 re-open stays
    assert [(r.event_type, r.episode, r.n_events, r.peak_value) for r in rows] == [
        ("a", 1, 2, 300.0)
    ]
    assert rows[0].alert_end == dt.datetime(2024, 1, 1, 0, 0, 20)


def test_stream_alerts_match_batch_on_fixture(spark, tmp_path):
    """Closed streaming episodes == the batch form's closed episodes on the
    real events table, split across 3 arbitrary micro-batches."""
    from hnsw_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "event_id", "ts", "value"
    )
    batch_closed = {
        (r.event_type, r.episode, r.alert_start, r.alert_end, r.n_events, r.peak_value)
        for r in threshold_alerts(ev, high=150, low=50).collect()
        if r.alert_end is not None
    }

    src = str(tmp_path / "fixture_events")
    base = time.time() - 1000
    # split by time thirds so per-key order across files is non-decreasing
    q1, q2 = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    _land(spark, src, "f1", ev.filter(F.col("event_id") <= q1), base)
    _land(spark, src, "f2",
          ev.filter((F.col("event_id") > q1) & (F.col("event_id") <= q2)), base + 10)
    _land(spark, src, "f3", ev.filter(F.col("event_id") > q2), base + 20)

    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_threshold_alerts(stream, high=150, low=50)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("alerts_fixture")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_type, r.episode, r.alert_start, r.alert_end, r.n_events, r.peak_value)
            for r in spark.sql("select * from alerts_fixture").collect()
        }
    finally:
        q.stop()
    assert got == batch_closed


def test_stateful_alerts_survive_checkpoint_restart(spark, tmp_path):
    """Exactly-once across a restart: an alert that OPENS before the query
    stops must close correctly after a new query resumes from the same
    checkpoint, with no duplicate or lost episodes.  (foreachBatch sink —
    the memory sink does not support checkpoint recovery.)"""
    src = str(tmp_path / "ckpt_events")
    ckpt = str(tmp_path / "ckpt_state")
    base = time.time() - 1000
    _land(spark, src, "f1", _ev(spark, [("a", 1, 0, 300.0), ("a", 2, 10, 90.0)]), base)

    emitted = []

    def run_query():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            stream_threshold_alerts(stream, high=150, low=50)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, eid: emitted.extend(df.collect()))
            .start()
        )

    q = run_query()
    try:
        q.processAllAvailable()
        assert emitted == []  # episode still open, nothing emitted
    finally:
        q.stop()

    # new data lands while the query is DOWN; the restart must resume from
    # checkpointed GroupState (episode still open) and close it
    _land(spark, src, "f2", _ev(spark, [("a", 3, 20, 20.0), ("a", 4, 30, 250.0)]), base + 10)
    q = run_query()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [
        (r.event_type, r.episode, r.n_events, r.peak_value) for r in emitted
    ] == [("a", 1, 2, 300.0)]
    assert emitted[0].alert_start == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert emitted[0].alert_end == dt.datetime(2024, 1, 1, 0, 0, 20)
