"""HLL sketch pins (operators/sketches.py): the mergeability that makes it
a one-pass 100 TB counter, determinism under partitioning, and accuracy."""

import pyspark.sql.functions as F

from hnsw_spark.operators.sketches import hll_estimate, hll_registers


def test_registers_merge_by_max(spark):
    whole = spark.range(2000).selectExpr("concat('x', id) AS v")
    lo = whole.filter("id < 700")
    hi = whole.filter("id >= 700")
    merged = (
        hll_registers(lo, "v")
        .unionByName(hll_registers(hi, "v"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    a = {(r.bucket, r.rho) for r in merged.collect()}
    b = {(r.bucket, r.rho) for r in hll_registers(whole, "v").collect()}
    assert a == b


def test_estimate_partitioning_invariant(spark):
    df = spark.range(3000).selectExpr("concat('y', id) AS v")
    one = hll_estimate(df.coalesce(1), "v").collect()[0]
    many = hll_estimate(df.repartition(16), "v").collect()[0]
    assert one == many


def test_duplicates_do_not_move_the_sketch(spark):
    base = spark.range(1000).selectExpr("concat('z', id) AS v")
    dup = base.unionByName(base).unionByName(base)
    assert (
        hll_estimate(base, "v").select("est_fp").collect()
        == hll_estimate(dup, "v").select("est_fp").collect()
    )


def test_within_published_error_bound(spark):
    df = spark.range(10000).selectExpr("concat('w', id) AS v")
    r = hll_estimate(df, "v").collect()[0]
    assert r.within_bound
    assert abs(r.est_fp / 10000.0 - 10000) / 10000 < 0.2


def test_streaming_hll_matches_batch(spark, tmp_path):
    """Epoch-partitioned register deltas merged by max == batch registers,
    replay-safe (the CM twin's property, with max instead of sum)."""
    from hnsw_spark.operators.sketches import hll_registers
    from hnsw_spark.streaming.sketch import StreamingHLL

    rows = [(f"u{i}",) for i in range(2500)]
    hll = StreamingHLL(str(tmp_path / "regs"))
    b1 = spark.createDataFrame(rows[:1000], "v string")
    b2 = spark.createDataFrame(rows[1000:], "v string")
    hll.process_batch(b1, 0)
    hll.process_batch(b2, 1)
    hll.process_batch(b2, 1)  # replayed epoch overwrites its own delta
    merged = {(r.bucket, r.rho) for r in hll.registers(spark).collect()}
    whole = {
        (r.bucket, r.rho)
        for r in hll_registers(
            spark.createDataFrame(rows, "v string"), "v"
        ).collect()
    }
    assert merged == whole
