"""Streaming trending top-N: foreachBatch rank over the complete-mode
windowed aggregate, and parity with the batch computation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hnsw_spark.streaming.trending import rank_trending, start_trending_query

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), 1, t, 1.0, "")
            for i, (m, t) in enumerate(rows)
        ],
        _SCHEMA,
    )


def test_rank_trending_orders_and_tie_breaks(spark):
    counts = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1), "b", 5, 5.0),
            (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1), "a", 5, 5.0),
            (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1), "c", 9, 9.0),
            (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1), "d", 1, 1.0),
        ],
        "win_start timestamp, win_end timestamp, event_type string, n long, "
        "total_value double",
    )
    got = [
        (r.rank, r.event_type)
        for r in rank_trending(counts, top_n=3).orderBy("rank").collect()
    ]
    assert got == [(1, "c"), (2, "a"), (3, "b")]  # ties a<b


def test_streaming_trending_matches_batch(spark, tmp_path):
    import glob
    import os
    import shutil
    import time

    rows = [(m, t) for m in range(0, 180, 7) for t in ("view", "click")] + [
        (m, "purchase") for m in range(0, 180, 31)
    ]
    df = _events(spark, rows)

    src = str(tmp_path / "trend_events")
    staged = df.coalesce(1)
    tmp = os.path.join(src, "_stage")
    staged.write.mode("overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.makedirs(src, exist_ok=True)
    shutil.move(part, os.path.join(src, "f1.parquet"))
    shutil.rmtree(tmp)

    captured = {}

    def grab(ranked, epoch_id):
        captured["rows"] = ranked.collect()

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = start_trending_query(
        stream, window="1 hour", slide="30 minutes", top_n=2, on_batch=grab
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from hnsw_spark.streaming.ingest import windowed_event_counts

    batch_counts = (
        df.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
        )
    )
    want = {
        (r.win_start, r.rank, r.event_type, r.n)
        for r in rank_trending(batch_counts, top_n=2).collect()
    }
    got = {
        (r.win_start, r.rank, r.event_type, r.n) for r in captured["rows"]
    }
    assert got == want and len(got) > 4
