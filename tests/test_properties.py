"""Property-based tests (hypothesis) for numeric invariants.

Kept to a few examples per property — every example round-trips through
Spark jobs, so the value is breadth of generated shapes, not example count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@given(
    vecs=st.lists(
        st.lists(finite_floats, min_size=4, max_size=4), min_size=1, max_size=6
    )
)
@settings(**SETTINGS)
def test_quantize_error_always_bounded(spark, vecs):
    """For ANY finite float vector, reconstruction error ≤ scale/2."""
    from hnsw_spark.functions.quantize import (
        quant_scale,
        quantize,
        reconstruction_error,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "id bigint, v array<float>",
    )
    out = (
        df.withColumn("scale", quant_scale("v"))
        .withColumn("q", quantize("v", F.col("scale")))
        .withColumn("err", reconstruction_error("v", F.col("q"), F.col("scale")))
        .collect()
    )
    for r in out:
        assert r.err <= r.scale / 2 + 1e-9 * max(1.0, r.scale)
        assert all(-127 <= q <= 127 for q in r.q)


@given(
    left_ts=st.lists(st.integers(0, 50), min_size=1, max_size=8, unique=True),
    right_ts=st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """The union+window as-of join agrees with pandas merge_asof
    (backward direction) on arbitrary timelines."""
    from hnsw_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(t,) for t in left_ts], "ts bigint")
    right = spark.createDataFrame(
        [(t, t * 10) for t in right_ts], "ts bigint, v bigint"
    )
    got = {
        r.ts: r.v for r in asof_join(left, right, on="ts").collect()
    }
    lp = pd.DataFrame({"ts": pd.array(sorted(left_ts), dtype="int64")})
    rp = pd.DataFrame(
        {
            "ts": pd.array(sorted(right_ts), dtype="int64"),
            "v": pd.array([t * 10 for t in sorted(right_ts)], dtype="int64"),
        }
    )
    want_df = pd.merge_asof(lp, rp, on="ts", direction="backward")
    want = {
        int(row.ts): (None if pd.isna(row.v) else int(row.v))
        for row in want_df.itertuples()
    }
    assert got == want


@given(
    a=st.sets(st.integers(0, 1 << 30), min_size=1, max_size=20),
    b=st.sets(st.integers(0, 1 << 30), min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_minhash_union_property_numpy(a, b):
    """min over A∪B = min(min A, min B) under every permutation — the
    algebraic fact that makes MinHash signatures mergeable (and why the
    duplicate-insensitive min needs no distinct shuffle)."""
    from hnsw_spark.functions.hashing import P31

    rng = np.random.default_rng(7)
    coef = rng.integers(1, P31, size=(16, 2))

    def sig(s):
        h = np.array(sorted(s))[:, None]
        return ((coef[:, 0] * h + coef[:, 1]) % P31).min(axis=0)

    assert np.array_equal(
        np.minimum(sig(a), sig(b)), sig(a | b)
    )
