"""Point-in-time trailing features: hand-built semantics (strictly-before,
tie exclusion, horizon boundary) plus a hypothesis parity check against a
pure-Python model on random feeds."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hnsw_spark.operators.features import trailing_window_features

_T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, uid, _T0 + dt.timedelta(seconds=s), v)
            for eid, uid, s, v in rows
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )


def test_strictly_before_excludes_self_and_ties(spark):
    rows = [
        (1, 1, 0, 10.0),
        (2, 1, 0, 20.0),   # same second as event 1: neither sees the other
        (3, 1, 5, 1.0),    # sees both t=0 events within 10s
        (4, 1, 11, 2.0),   # t=0 events fall OUT of [1, 11): 11-10=1 > 0
    ]
    out = {
        r.event_id: (r["n_10s"], r["sum_10s_fp"])
        for r in trailing_window_features(
            _ev(spark, rows), horizons_s=[10]
        ).collect()
    }
    assert out[1] == (0, 0) and out[2] == (0, 0)  # ties excluded
    assert out[3] == (2, 300000)  # 30.0 at scale 4
    assert out[4] == (1, 10000)  # only event 3 in [1, 11)


def test_keys_are_independent(spark):
    rows = [(1, 1, 0, 5.0), (2, 2, 3, 7.0)]
    out = {
        r.event_id: r["n_60s"]
        for r in trailing_window_features(
            _ev(spark, rows), horizons_s=[60]
        ).collect()
    }
    assert out == {1: 0, 2: 0}


@pytest.mark.slow
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    max_examples=8,
    deadline=None,
)
def test_trailing_features_match_python_model(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 30))
    horizons = [3, 10]
    rows = [
        (
            int(i),
            int(rng.integers(0, 3)),
            int(rng.integers(0, 15)),  # small range: plenty of ties
            float(np.round(rng.uniform(-5, 5), 3)),
        )
        for i in range(n)
    ]
    got = {
        r.event_id: {
            h: (r[f"n_{h}s"], r[f"sum_{h}s_fp"]) for h in horizons
        }
        for r in trailing_window_features(
            _ev(spark, rows), horizons_s=horizons
        ).collect()
    }
    q = lambda v: int(math.floor(v * 10**4 + 0.5))
    for eid, uid, s, v in rows:
        for h in horizons:
            prior = [
                (s2, v2)
                for _, u2, s2, v2 in rows
                if u2 == uid and s - h <= s2 <= s - 1
            ]
            assert got[eid][h] == (
                len(prior),
                sum(q(v2) for _, v2 in prior),
            ), (seed, eid, h)
