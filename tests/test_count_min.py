"""Count-min sketch pins: merge-by-sum, never-undercount, and the
epsilon-N overshoot envelope on adversarially skewed input."""

import pyspark.sql.functions as F

from hnsw_spark.operators.sketches import count_min_counters, count_min_estimate


_ROWS = [(f"t{i}",) for i in range(50) for _ in range(1000 // (i + 1))]


def _stream(spark):
    # zipf-ish: token i appears 1000//(i+1) times
    return spark.createDataFrame(_ROWS, "token string")


def test_counters_merge_by_cellwise_sum(spark):
    lo = spark.createDataFrame(_ROWS[:700], "token string")
    hi = spark.createDataFrame(_ROWS[700:], "token string")
    merged = (
        count_min_counters(lo, "token")
        .unionByName(count_min_counters(hi, "token"))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_counters(_stream(spark), "token")
    a = {(r.row, r.col, r.cnt) for r in merged.collect()}
    b = {(r.row, r.col, r.cnt) for r in whole.collect()}
    assert a == b


def test_never_undercounts_and_bounded_overshoot(spark):
    s = _stream(spark)
    exact = s.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = count_min_estimate(s, exact.select("token"), "token")
    joined = exact.join(est, "token").collect()
    n_total = sum(r.exact for r in joined)
    for r in joined:
        assert r.est >= r.exact, r.token
        # e*N/width envelope, all 50 probes (deterministic given the data)
        assert r.est - r.exact <= 2.72 * n_total / 1024 + 1, r.token


def test_absent_value_estimates_small(spark):
    s = _stream(spark)
    ghost = spark.createDataFrame([("never-seen",)], "token string")
    [r] = count_min_estimate(s, ghost, "token").collect()
    n_total = s.count()
    assert 0 <= r.est <= 2.72 * n_total / 1024 + 1


def test_streaming_count_min_matches_batch(spark, tmp_path):
    """Epoch-partitioned CM deltas merged by sum == the batch sketch, and
    an epoch replay (simulated retry) cannot double-count."""
    from hnsw_spark.streaming.sketch import StreamingCountMin

    cm = StreamingCountMin(str(tmp_path / "counters"))
    b1 = spark.createDataFrame(_ROWS[:900], "token string")
    b2 = spark.createDataFrame(_ROWS[900:], "token string")
    cm.process_batch(b1, 0)
    cm.process_batch(b2, 1)
    cm.process_batch(b2, 1)  # replayed epoch overwrites its own delta
    merged = {(r.row, r.col, r.cnt) for r in cm.counters(spark).collect()}
    whole = {
        (r.row, r.col, r.cnt)
        for r in count_min_counters(_stream(spark), "token").collect()
    }
    assert merged == whole


def test_streaming_count_min_end_to_end_stream(spark, tmp_path):
    from hnsw_spark.streaming.sketch import StreamingCountMin

    src = str(tmp_path / "src")
    spark.createDataFrame(_ROWS[:200], "token string").coalesce(2).write.mode(
        "overwrite"
    ).parquet(src)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cm = StreamingCountMin(str(tmp_path / "counters"))
    q = cm.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    merged = {(r.row, r.col, r.cnt) for r in cm.counters(spark).collect()}
    batch = spark.createDataFrame(_ROWS[:200], "token string")
    whole = {
        (r.row, r.col, r.cnt)
        for r in count_min_counters(batch, "token").collect()
    }
    assert merged == whole
