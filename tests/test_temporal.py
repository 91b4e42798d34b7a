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


def _ts_df(spark, rows, schema):
    from pyspark.sql import functions as F  # noqa: F401

    return spark.createDataFrame(rows, schema)


def test_interval_join_matches_naive_range_join(spark):
    """Bin-bucketed plan == naive non-equi join, windows overlapping and
    spanning multiple bins."""
    import datetime as dt

    from hnsw_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=7 * i)) for i in range(40)],
        "event_id long, ts timestamp_ntz",
    )
    wins = spark.createDataFrame(
        [
            (w, t0 + dt.timedelta(minutes=30 * w), t0 + dt.timedelta(minutes=30 * w + 75))
            for w in range(6)
        ],
        "window_id long, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    got = {
        (r.event_id, r.window_id)
        for r in interval_join(events, wins, bin_seconds=600).collect()
    }
    naive = {
        (r.event_id, r.window_id)
        for r in events.join(
            wins,
            (events.ts >= wins.w_start) & (events.ts < wins.w_end),
        ).collect()
    }
    assert got == naive and len(got) > 40  # overlap: avg >1 window/event


def test_interval_join_end_exclusive_on_bin_boundary(spark):
    import datetime as dt

    from hnsw_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=3600))], "event_id long, ts timestamp_ntz"
    )
    # window ends exactly at the event's timestamp -> no match (end-exclusive)
    wins = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(seconds=3600))],
        "window_id long, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    assert interval_join(events, wins, bin_seconds=600).count() == 0


def test_interval_join_plan_has_no_nested_loop(spark):
    """The scale contract: equi-join on the bin key, not
    BroadcastNestedLoopJoin."""
    import datetime as dt

    from hnsw_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i)) for i in range(10)],
        "event_id long, ts timestamp_ntz",
    )
    wins = spark.createDataFrame(
        [(0, t0, t0 + dt.timedelta(hours=1))],
        "window_id long, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    plan = interval_join(events, wins)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_recency_weighted_scores_halving(spark):
    """One event per halflife step: weights must be exactly 1, 1/2, 1/4..."""
    import datetime as dt

    from hnsw_spark.operators.temporal import recency_weighted_scores

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(days=i), 100, 8.0) for i in range(4)
    ]  # ages 3,2,1,0 days from max
    df = spark.createDataFrame(
        [(u, ts, e, v) for u, ts, e, v in rows],
        "user_id long, ts timestamp_ntz, event_id long, value double",
    )
    out = recency_weighted_scores(df, halflife_seconds=86400).collect()[0]
    assert out.n_events == 4
    assert out.last_ts == t0 + dt.timedelta(days=3)
    # 8*(1 + 1/2 + 1/4 + 1/8) = 15.0
    assert out.recency_score == 15.0
