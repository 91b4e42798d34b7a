"""Unit tests for the as-of join operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnsw_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, 40), (1, 2, 20), (1, 5, 10), (2, 9, 30)],
        "k bigint, ts bigint, x bigint",
    )
    right = spark.createDataFrame(
        [(1, 2, 100), (1, 4, 200), (2, 10, 300)],
        "k bigint, ts bigint, v bigint",
    )
    return left, right


def test_asof_backward_with_ties_and_no_match(spark):
    """Mirrors the DuckDB ASOF LEFT JOIN reference output: equal ts matches
    (<= semantics), earlier lefts get NULL, later rights are invisible."""
    left, right = _frames(spark)
    rows = {
        (r.k, r.ts): r.v
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    assert rows == {(1, 1): None, (1, 2): 100, (1, 5): 200, (2, 9): None}


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    res = {
        (r.k, r.ts): r.v
        for r in asof_join(
            left, right, on="ts", by="k",
            tolerance=lambda l, r: (l - r) <= 1,
        ).collect()
    }
    # (1,5) matched right ts=4 at staleness 1 (kept); (1,2) staleness 0
    assert res == {(1, 1): None, (1, 2): 100, (1, 5): 200, (2, 9): None}
    tight = {
        (r.k, r.ts): r.v
        for r in asof_join(
            left, right, on="ts", by="k",
            tolerance=lambda l, r: (l - r) <= 0,
        ).collect()
    }
    assert tight[(1, 5)] is None  # stale match nulls out, no older fallback


def test_asof_overlapping_value_col_gets_suffix(spark):
    left = spark.createDataFrame([(1, 5, 1.0)], "k bigint, ts bigint, v double")
    right = spark.createDataFrame([(1, 3, 2.0)], "k bigint, ts bigint, v double")
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row.v == 1.0 and row.v_r == 2.0


def test_asof_no_keys_global_timeline(spark):
    left = spark.createDataFrame([(3,), (10,)], "ts bigint")
    right = spark.createDataFrame([(2, "a"), (7, "b")], "ts bigint, tag string")
    rows = {r.ts: r.tag for r in asof_join(left, right, on="ts").collect()}
    assert rows == {3: "a", 10: "b"}


def test_asof_struct_payload_is_atomic(spark):
    """A right row with a NULL in one payload column must NOT have that
    column stitched from an older right row — the whole payload comes from
    the single as-of winner."""
    left = spark.createDataFrame([(1, 10)], "k bigint, ts bigint")
    right = spark.createDataFrame(
        [(1, 1, "old", 7.0), (1, 5, "new", None)],
        "k bigint, ts bigint, tag string, score double",
    )
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row.tag == "new" and row.score is None
