"""Unit pins for the round-4 late additions: time_weighted_avg against a
hand-computed series, and dsir_select's selection contract."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from hnsw_spark.operators.curation import dsir_select
from hnsw_spark.operators.temporal import time_weighted_avg


def test_twap_matches_hand_computation(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # value 10 holds 2s, value 20 holds 1s, value 40 holds 1s, last 0-wt
        (1, t0, "a", 10.0),
        (2, t0 + dt.timedelta(seconds=2), "a", 20.0),
        (3, t0 + dt.timedelta(seconds=3), "a", 40.0),
        (4, t0 + dt.timedelta(seconds=4), "a", 999.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    [r] = time_weighted_avg(ev).collect()
    assert r.n_events == 4
    assert r.total_dur_us == 4_000_000
    # (2s*10 + 1s*20 + 1s*40) / 4s = 20.0 → 200000 in 1e-4 fixed point
    assert r.twap_fp == 200_000


def test_twap_single_event_group_zero_duration(spark):
    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), "solo", 7.0)],
        "event_id long, ts timestamp_ntz, event_type string, value double",
    )
    [r] = time_weighted_avg(ev).collect()
    # no interval at all: zero duration, NULL mean (x DIV 0 -> NULL)
    assert r.total_dur_us == 0 and r.twap_fp is None


def test_dsir_prefers_target_like_documents(spark):
    # target docs speak 'alpha'; raw background speaks 'beta' — documents
    # using the target vocabulary must outscore and be selected
    # distinct filler singletons keep background scores UNtied: with a
    # fully tied background the percentile cut lands on the tie value and
    # every tied doc is (by documented semantics) kept
    rows = [(i, "alpha " * 5, "tgt") for i in range(10)]
    rows += [(10 + i, f"beta beta beta w{i}", "bg") for i in range(30)]
    rows += [(40, "alpha alpha alpha", "bg"), (41, "beta beta beta", "bg")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    res = dsir_select(
        docs, target_col="source", target_value="tgt", keep_frac=0.25
    )
    by_id = {r.doc_id: r for r in res.collect()}
    assert by_id[40].score_fp > by_id[41].score_fp
    assert by_id[40].selected and not by_id[41].selected
    # every target-vocabulary doc is kept at a 25% budget
    assert all(by_id[i].selected for i in range(10))


def test_dsir_keeps_row_per_doc_including_empty(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "s"), (1, "", "s"), (2, "   ", "s")],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: r for r in dsir_select(docs).collect()}
    assert set(rows) == {0, 1, 2}
    # token-less docs keep a row but can never be selected
    assert rows[1].n_tokens == 0 and not rows[1].selected
    assert rows[2].n_tokens == 0 and not rows[2].selected
