"""Property-based tests (hypothesis) for the numeric kernels whose
conventions are easy to silently get wrong:

- the floor-index percentile (src/bench/metrics.ts:51-57) vs a direct
  numpy model, including the p-clamping and empty-input zeros;
- similarity kernels vs numpy float64 ground truth (the reference computes
  f64 over f32 inputs);
- MinHash signature containment: permutation-min over a superset is ≤ the
  subset's min (monotonicity that makes banded LSH sound);
- recall micro-average equals Σhits/Σtotal, never mean-of-ratios
  (src/bench/metrics.ts:70-75).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

floats = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
)


@st.composite
def vec_pairs(draw):
    d = draw(st.integers(min_value=1, max_value=8))
    a = draw(st.lists(floats, min_size=d, max_size=d))
    b = draw(st.lists(floats, min_size=d, max_size=d))
    return a, b


class TestPercentileFloorProperty:
    @given(
        vals=st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=1,
            max_size=50,
        ),
        p=st.floats(min_value=-50, max_value=150, allow_nan=False),
    )
    @settings(max_examples=60, deadline=None)
    def test_matches_numpy_model(self, spark_session_cached, vals, p):
        from hnsw_spark.operators.evaluation import percentile_floor

        spark = spark_session_cached
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        got = percentile_floor(df, "v", [p]).first()[0]
        pc = min(max(p, 0.0), 100.0)  # reference clamps (metrics.ts:52)
        idx = math.floor(pc / 100 * (len(vals) - 1))
        expected = sorted(vals)[idx]
        assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


@given(pair=vec_pairs())
@settings(max_examples=80, deadline=None)
def test_similarity_kernels_match_numpy(spark_session_cached, pair):
    from hnsw_spark.functions.similarity import (
        cosine_similarity,
        dot_product,
        euclidean_distance,
        euclidean_similarity,
    )
    from pyspark.sql import functions as F

    spark = spark_session_cached
    a, b = pair
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    row = df.select(
        dot_product("a", "b").alias("dot"),
        cosine_similarity("a", "b").alias("cos"),
        euclidean_distance("a", "b").alias("dist"),
        euclidean_similarity("a", "b").alias("esim"),
    ).first()
    # numpy model over the SAME f32-rounded inputs, f64 arithmetic
    av = np.asarray(a, dtype=np.float32).astype(np.float64)
    bv = np.asarray(b, dtype=np.float32).astype(np.float64)
    assert row.dot == pytest.approx(float(av @ bv), rel=1e-6, abs=1e-6)
    dist = float(np.sqrt(((av - bv) ** 2).sum()))
    assert row.dist == pytest.approx(dist, rel=1e-6, abs=1e-6)
    assert row.esim == pytest.approx(1.0 / (1.0 + dist), rel=1e-6, abs=1e-6)
    denom = float(np.linalg.norm(av) * np.linalg.norm(bv))
    if denom == 0.0:
        # reference has no zero-norm guard → NaN (src/similarity.ts:10-12)
        assert row.cos is None or math.isnan(row.cos)
    else:
        assert row.cos == pytest.approx(float(av @ bv) / denom, rel=1e-5, abs=1e-6)


@given(
    words_a=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30),
    extra=st.sets(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=10),
)
@settings(max_examples=100, deadline=None)
def test_minhash_min_monotone_under_superset(words_a, extra):
    # model of perm_hash: min over a superset can only shrink — the property
    # that makes signature agreement track Jaccard similarity
    from hnsw_spark.functions.hashing import P31, minhash_perms

    perms = minhash_perms(8)
    sup = words_a | extra
    for a, b in perms:
        mins_a = min((a * h + b) % P31 for h in words_a)
        mins_sup = min((a * h + b) % P31 for h in sup)
        assert mins_sup <= mins_a


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # hits
            st.integers(min_value=1, max_value=5),  # total ≥ hits enforced below
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_mean_recall_is_micro_average(spark_session_cached, data):
    from hnsw_spark.operators.evaluation import mean_recall

    spark = spark_session_cached
    rows = [(i, min(h, t), t) for i, (h, t) in enumerate(data)]
    df = spark.createDataFrame(rows, "query_id long, hits long, total long")
    got = mean_recall(df).first().mean_recall
    expected = sum(r[1] for r in rows) / sum(r[2] for r in rows)
    assert got == pytest.approx(expected, rel=1e-9)


@pytest.fixture(scope="module")
def spark_session_cached(spark):
    return spark


# ---- round-2 additions: quantization bound, as-of vs pandas, union-min ----

from hypothesis import HealthCheck

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)

_R2_SETTINGS = dict(
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
@settings(**_R2_SETTINGS)
def test_quantize_error_always_bounded(spark, vecs):
    """For ANY finite float vector, reconstruction error ≤ scale/2."""
    from pyspark.sql import functions as F

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
@settings(**_R2_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    """The union+window as-of join agrees with pandas merge_asof
    (backward direction) on arbitrary timelines."""
    import pandas as pd

    from hnsw_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(t,) for t in left_ts], "ts bigint")
    right = spark.createDataFrame(
        [(t, t * 10) for t in right_ts], "ts bigint, v bigint"
    )
    got = {r.ts: r.v for r in asof_join(left, right, on="ts").collect()}
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
@settings(max_examples=50, deadline=None)
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

    assert np.array_equal(np.minimum(sig(a), sig(b)), sig(a | b))
