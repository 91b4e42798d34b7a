"""Unit tests for the evaluation operators (reference src/bench/metrics.ts,
src/bench/report.ts) on tiny deterministic frames."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import (
    ab_compare,
    latency_summary,
    mean_recall,
    percentile_floor,
    recall_table,
)


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id bigint, id bigint")


def test_recall_at_k(spark):
    # query 1: 2/3 overlap; query 2: 0/2 overlap (approx missing entirely)
    exact = _results(spark, [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)])
    approx = _results(spark, [(1, 10), (1, 11), (1, 99)])
    rec = {r.query_id: r for r in recall_table(approx, exact).collect()}
    assert rec[1].hits == 2 and rec[1].total == 3
    assert rec[1].recall == pytest.approx(2 / 3)
    assert rec[2].hits == 0 and rec[2].recall == 0.0


def test_mean_recall_is_micro_average(spark):
    # reference src/bench/metrics.ts:70-75: Σhits/Σtotal, NOT mean of ratios
    exact = _results(spark, [(1, 10), (2, 20), (2, 21), (2, 22), (2, 23)])
    approx = _results(spark, [(1, 10), (2, 20)])
    row = mean_recall(recall_table(approx, exact)).first()
    assert row.mean_recall == pytest.approx(2 / 5)  # micro; mean-of-ratios = 0.625


def test_percentile_floor_convention(spark):
    # sorted[floor(p/100*(n-1))] over 1..10: p50 → idx floor(4.5)=4 → value 5
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
    row = percentile_floor(df, "v", (0, 50, 90, 99, 100)).first()
    assert (row.p0, row.p50, row.p90, row.p99, row.p100) == (1.0, 5.0, 9.0, 9.0, 10.0)


def test_latency_summary_shape(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    row = latency_summary(df, "v").first()
    assert row["count"] == 100
    assert row.avg == pytest.approx(49.5)
    # floor-index: p50 → floor(0.5*99)=49 → value 49.0
    assert (row.p50, row.p90, row.p95, row.p99) == (49.0, 89.0, 94.0, 98.0)


def test_ab_compare_full_outer_and_strict(spark):
    base = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, m double")
    cand = spark.createDataFrame([("a", 1.5), ("c", 9.0)], "k string, m double")
    out = {r.k: r for r in ab_compare(base, cand, ["k"], ["m"]).collect()}
    assert out["a"].m_delta == pytest.approx(0.5)
    assert out["b"].in_candidate is False and out["b"].m_delta is None
    assert out["c"].in_base is False
    strict = ab_compare(base, cand, ["k"], ["m"], strict=True)
    assert [r.k for r in strict.collect()] == ["a"]


def test_percentile_empty_and_clamp(spark):
    df = spark.createDataFrame([], "v double")
    # empty input → zero groups → empty result (reference returns 0; the
    # relational shape is "no rows")
    assert percentile_floor(df, "v", (50,)).count() in (0, 1)
    one = spark.createDataFrame([(42.0,)], "v double")
    row = percentile_floor(one, "v", (-5, 200)).first()
    # p clamped to [0,100] (src/bench/metrics.ts:53) → both hit the only value
    assert row["p-5"] == 42.0 and row.p200 == 42.0


def test_dsum_survives_bigint_overflow(spark):
    """100 rows of 1e14 quantize to 1e18 each; a BIGINT accumulator wraps
    silently at ~9.2e18 in non-ANSI mode — the decimal(38,0) accumulator
    must return the exact sum (ADVICE r2, the 100 TB money-sum regime)."""
    from hnsw_spark.operators.evaluation import dsum

    df = spark.range(100).select(F.lit(1.0e14).alias("v"))
    got = df.agg(dsum("v").alias("s")).collect()[0]["s"]
    assert got == pytest.approx(1.0e16, rel=1e-12)


def test_classifier_eval_hand_computed(spark):
    # predictions: 3 correct of 4; marginals give pe = (2*2 + 2*2)/16 = 0.5
    pred = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 2)], "query_id long, pred_label int"
    )
    truth = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 1)], "vec_id long, label int"
    )
    from hnsw_spark.operators.evaluation import classifier_eval

    [r] = classifier_eval(pred, truth).collect()
    assert (r["n"], r["n_correct"]) == (4, 3)
    assert r["accuracy"] == 0.75
    # true marginals {1:3, 2:1}, pred marginals {1:2, 2:2}
    pe = (3 * 2 + 1 * 2) / 16
    assert r["expected_agreement"] == pe
    assert r["kappa"] == (0.75 - pe) / (1 - pe)


def test_classifier_eval_constant_labels_kappa_zero(spark):
    # both sides constant: pe = 1 → kappa degenerates to 0, not NaN
    pred = spark.createDataFrame([(0, 5), (1, 5)], "query_id long, pred_label int")
    truth = spark.createDataFrame([(0, 5), (1, 5)], "vec_id long, label int")
    from hnsw_spark.operators.evaluation import classifier_eval

    [r] = classifier_eval(pred, truth).collect()
    assert r["accuracy"] == 1.0 and r["kappa"] == 0.0
