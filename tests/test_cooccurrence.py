"""PMI co-occurrence, funnel, and heavy-hitter sketch unit tests."""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime

import pyspark.sql.functions as F

from hnsw_spark.operators.cooccurrence import cooccurrence_counts, pmi_pairs
from hnsw_spark.operators.sketches import misra_gries
from hnsw_spark.operators.temporal import funnel
from hnsw_spark.sources.synthetic import synthetic_zipf_tokens


def _pairs_py(tokens: list[str], window: int) -> Counter:
    c: Counter = Counter()
    for i in range(len(tokens)):
        for j in range(i + 1, min(i + window + 1, len(tokens))):
            a, b = sorted((tokens[i], tokens[j]))
            c[(a, b)] += 1
    return c


def test_cooccurrence_counts_match_bruteforce(spark):
    texts = ["a b c a b", "x y", "z", "a a a a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r.a, r.b): r.pair_count
        for r in cooccurrence_counts(df, window=3).collect()
    }
    want: Counter = Counter()
    for t in texts:
        want.update(_pairs_py(t.split(), 3))
    assert got == dict(want)


def test_pmi_value_matches_formula(spark):
    texts = ["a b a b a b"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = {(r.a, r.b): r for r in pmi_pairs(df, window=2, min_count=1).collect()}
    # tokens: a x3, b x3, N=6; pairs at offsets 1,2 -> 5+4=9 total
    r = rows[("a", "b")]
    assert (r.count_a, r.count_b) == (3, 3)
    want = math.floor(
        math.log((r.pair_count * 6.0 * 6.0) / (9.0 * 3.0 * 3.0)) * 1e6 + 0.5
    )
    assert r.pmi_q6 == want


def test_funnel_strict_ordering(spark):
    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1 converts fully: view@1, click@3, purchase@5
        (1, t(1), "view"), (1, t(3), "click"), (1, t(5), "purchase"),
        # user 2: click BEFORE first view must not count; no purchase
        (2, t(2), "click"), (2, t(4), "view"), (2, t(6), "click"),
        # user 3: purchase before click -> stage 3 null
        (3, t(1), "view"), (3, t(2), "purchase"), (3, t(3), "click"),
        # user 4: never views -> absent entirely
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    out = {r.user_id: r for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1].t_view, out[1].t_click, out[1].t_purchase) == (t(1), t(3), t(5))
    assert (out[2].t_click, out[2].t_purchase) == (t(6), None)
    assert (out[3].t_click, out[3].t_purchase) == (t(3), None)


def test_misra_gries_exact_when_vocab_fits(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "token string"
    )
    got = {r.token: r.est for r in misra_gries(df, k=10).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}


def test_misra_gries_bound_on_skewed_stream(spark):
    n, k = 20_000, 50
    stream = synthetic_zipf_tokens(spark, n, 1000, seed=11)
    exact = {r.token: r.cnt for r in
             stream.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    sk = {r.token: r.est for r in misra_gries(stream, k=k).collect()}
    assert len(sk) <= k
    bound = n / (k + 1)
    for tok, est in sk.items():
        assert 0 <= exact[tok] - est <= bound
    for tok, cnt in exact.items():
        if cnt > bound:
            assert tok in sk, f"true hitter {tok} ({cnt}) missing"
