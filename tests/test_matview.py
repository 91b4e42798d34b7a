"""Materialized-view navigation: coarse aggregations answered from the
hourly summary equal recomputation from raw events (exact, thanks to the
fixed-point stored state)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import dquant
from hnsw_spark.plans.matview import MatviewCatalog
from hnsw_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _hourly_matview(spark):
    ev = load_table(spark, SF, "events")
    hour = F.expr(
        "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)"
    )
    day = F.expr("make_timestamp_ntz(year(ts), month(ts), day(ts), 0, 0, 0)")
    return ev.groupBy(
        hour.alias("hour"), day.alias("day"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(dquant("value", 4).cast("decimal(38,0)")).alias("q_sum"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


def test_answer_from_containing_view_matches_raw(spark):
    cat = MatviewCatalog()
    cat.register(
        "hourly",
        _hourly_matview(spark),
        keys=["hour", "day", "event_type"],
        state={"n": "count", "q_sum": "sum", "v_min": "min", "v_max": "max"},
    )

    # daily per type, answered from the hourly summary
    got = cat.answer(
        ["day", "event_type"],
        {"n": "n", "q_sum": "q_sum", "v_max": "v_max"},
    )
    assert got is not None
    ev = load_table(spark, SF, "events")
    day = F.expr("make_timestamp_ntz(year(ts), month(ts), day(ts), 0, 0, 0)")
    want = ev.groupBy(day.alias("day"), F.col("event_type")).agg(
        F.count("*").alias("n"),
        F.sum(dquant("value", 4).cast("decimal(38,0)")).alias("q_sum"),
        F.max("value").alias("v_max"),
    )
    g = {(r.day, r.event_type): (r.n, r.q_sum, r.v_max) for r in got.collect()}
    w = {(r.day, r.event_type): (r.n, r.q_sum, r.v_max) for r in want.collect()}
    assert g == w and len(g) > 5


def test_answer_declines_non_contained_requests(spark):
    cat = MatviewCatalog()
    cat.register(
        "hourly",
        _hourly_matview(spark),
        keys=["hour", "day", "event_type"],
        state={"n": "count", "q_sum": "sum"},
    )
    # user_id is not a view key -> cannot serve
    assert cat.answer(["user_id"], {"n": "n"}) is None
    # v_min state not registered -> cannot serve
    assert cat.answer(["event_type"], {"v_min": "v_min"}) is None


def test_smallest_containing_view_wins(spark):
    cat = MatviewCatalog()
    hourly = _hourly_matview(spark)
    cat.register(
        "hourly", hourly, keys=["hour", "day", "event_type"],
        state={"n": "count"},
    )
    daily = hourly.groupBy("day", "event_type").agg(F.sum("n").alias("n"))
    cat.register(
        "daily", daily, keys=["day", "event_type"], state={"n": "count"}
    )
    out = cat.answer(["event_type"], {"n": "n"})
    # both contain the request; the daily (fewer keys) view must serve it
    # and still be exact
    ev = load_table(spark, SF, "events")
    w = {r.event_type: r.n for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    g = {r.event_type: r.n for r in out.collect()}
    assert g == w
