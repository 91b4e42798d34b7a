"""Stateful streaming sessionization (applyInPandasWithState): cross-batch
state carry, gap-close semantics, and parity with the batch user_sessions
window query."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from hnsw_spark.streaming.sessionize import stream_sessionize

_SCHEMA = "user_id long, ts timestamp, value double"


def _write_file(spark, src_dir, name, rows, mtime):
    """Write one flat parquet file into the stream source dir with a forced
    mtime (the file source processes oldest-mtime first)."""
    import glob
    import shutil

    df = spark.createDataFrame(
        [
            (u, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), v)
            for u, t, v in rows
        ],
        _SCHEMA,
    )
    tmp = os.path.join(src_dir, f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.makedirs(src_dir, exist_ok=True)
    dest = os.path.join(src_dir, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def test_sessions_close_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    base = time.time() - 1000
    # three files == three micro-batches (maxFilesPerTrigger=1, mtime order)
    _write_file(spark, src, "f1", [(1, 0, 1.0), (1, 10, 2.0), (2, 0, 9.0)],
                base)
    _write_file(spark, src, "f2", [(1, 2000, 3.0), (1, 2100, 4.0)],
                base + 10)
    _write_file(spark, src, "f3", [(1, 5000, 5.0)], base + 20)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "select * from sessions order by user_id, session_start"
        ).collect()
    finally:
        q.stop()

    # user 1: session [0,10] closed by the t=2000 event (batch 2); session
    # [2000,2100] closed by t=5000 (batch 3); [5000,...] still open.
    # user 2: single open session, never emitted.
    assert [(r.user_id, r.n_events, r.total_value) for r in rows] == [
        (1, 2, 3.0),
        (1, 2, 7.0),
    ]
    epoch = dt.datetime(1970, 1, 1)
    assert rows[0].session_start == epoch
    assert rows[0].session_end == epoch + dt.timedelta(seconds=10)
    assert rows[1].session_start == epoch + dt.timedelta(seconds=2000)
    assert rows[1].session_end == epoch + dt.timedelta(seconds=2100)


def test_stream_sessionize_matches_batch_user_sessions(spark, tmp_path):
    """closed-sessions + one open tail per active user == the batch window
    query's session count, on the real events fixture."""
    from hnsw_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "value")
    )
    src = str(tmp_path / "replay")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream_sessionize(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("replay_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        closed = (
            spark.sql("select * from replay_sessions")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_closed"))
            .collect()
        )
    finally:
        q.stop()
    closed_map = {r.user_id: r.n_closed for r in closed}

    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    batch = {
        r.user_id: r.n_sessions
        for r in QUERIES["user_sessions"](spark, sf_dir).collect()
        if r.user_id < 50
    }
    assert batch  # fixture has users below 50
    for uid, n_sessions in batch.items():
        # every user with events has exactly one open (unemitted) session
        assert closed_map.get(uid, 0) + 1 == n_sessions, uid


def test_builtin_session_window_matches_custom_gap_sessions(spark):
    """Spark's built-in session_window(ts, gap) must count the same
    per-user sessions as the custom lag-window gap logic in the
    user_sessions query (same 30-min gap, real events fixture)."""
    from pyspark.sql import functions as F

    from hnsw_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("user_id") < 500
    )
    builtin = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n").alias("n_events"),
        )
    )
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    custom = QUERIES["user_sessions"](spark, "/root/testdata/sf0.001")
    got = {(r.user_id, r.n_sessions, r.n_events) for r in builtin.collect()}
    want = {(r.user_id, r.n_sessions, r.n_events) for r in custom.collect()}
    assert got == want and len(got) > 10
