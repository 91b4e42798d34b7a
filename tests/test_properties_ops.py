"""Property-based tests for the late-round operators: each example checks
a whole batch in one Spark job (examples kept low — every example pays a
job), against pure-Python models.

- binarize/hamming: Catalyst packing+popcount == numpy sign-mismatch count
  for random vectors and dims (incl. non-multiple-of-32 dims);
- token_budget_select: bucket-threshold plan == global greedy for random
  corpora and budget fractions;
- interval_join: bin-bucketed equi-join == naive range predicate for
  random overlapping windows and bin widths;
- recency weights: fixed-point decayed sum == Python model with exact
  2^-k scaling.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)


@pytest.fixture(scope="module")
def spark_session_cached(spark):
    return spark


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    dim=st.integers(min_value=1, max_value=96),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=12, deadline=None)
def test_binarize_hamming_matches_numpy(spark_session_cached, seed, dim):
    from hnsw_spark.functions.quantize import binarize, hamming_distance

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    mats = rng.standard_normal((6, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mats)],
        "vec_id long, embedding array<float>",
    )
    codes = df.select("vec_id", binarize("embedding", dim).alias("c"))
    a = codes.select(F.col("vec_id").alias("ia"), F.col("c").alias("ca"))
    b = codes.select(F.col("vec_id").alias("ib"), F.col("c").alias("cb"))
    got = {
        (r.ia, r.ib): r.h
        for r in a.crossJoin(b)
        .select("ia", "ib", hamming_distance("ca", "cb").alias("h"))
        .collect()
    }
    # the sign test runs on the float32-stored values
    bits = mats.astype(np.float32) > 0
    for (i, j), h in got.items():
        assert h == int(np.sum(bits[i] != bits[j]))
        assert got[(i, j)] == got[(j, i)]
    assert all(got[(i, i)] == 0 for i in range(6))


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=40), min_size=3, max_size=25),
    frac_pct=st.integers(min_value=10, max_value=90),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=10, deadline=None)
def test_token_budget_matches_python_greedy(
    spark_session_cached, tokens, frac_pct
):
    from hnsw_spark.operators.curation import token_budget_select

    spark = spark_session_cached
    docs = spark.createDataFrame(
        [(i, "w " * t) for i, t in enumerate(tokens)],
        "doc_id long, text string",
    )
    out = token_budget_select(docs, budget_fraction=frac_pct / 100).collect()
    budget = int(sum(r.tokens for r in out) * frac_pct / 100)
    cum, want = 0, {}
    for r in sorted(out, key=lambda r: (-r.quality, r.doc_id)):
        cum += r.tokens
        want[r.doc_id] = cum <= budget
    assert {r.doc_id: r.selected for r in out} == want


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    bin_minutes=st.integers(min_value=1, max_value=90),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=10, deadline=None)
def test_interval_join_matches_naive(spark_session_cached, seed, bin_minutes):
    from hnsw_spark.operators.temporal import interval_join

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (int(i), t0 + dt.timedelta(minutes=int(m)))
            for i, m in enumerate(rng.integers(0, 300, size=25))
        ],
        "event_id long, ts timestamp_ntz",
    )
    wins = []
    for w in range(6):
        start = int(rng.integers(0, 280))
        wins.append(
            (
                w,
                t0 + dt.timedelta(minutes=start),
                t0 + dt.timedelta(minutes=start + int(rng.integers(1, 120))),
            )
        )
    windows = spark.createDataFrame(
        wins, "window_id long, w_start timestamp_ntz, w_end timestamp_ntz"
    )
    got = {
        (r.event_id, r.window_id)
        for r in interval_join(
            events, windows, bin_seconds=bin_minutes * 60
        ).collect()
    }
    want = {
        (r.event_id, r.window_id)
        for r in events.join(
            windows, (events.ts >= windows.w_start) & (events.ts < windows.w_end)
        ).collect()
    }
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=500, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    seed=st.integers(min_value=0, max_value=1000),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=10, deadline=None)
def test_recency_scores_match_python_model(spark_session_cached, vals, seed):
    from hnsw_spark.operators.temporal import recency_weighted_scores

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    offsets = sorted(int(x) for x in rng.integers(0, 10_000, size=len(vals)))
    df = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(minutes=o), float(v))
            for o, v in zip(offsets, vals)
        ],
        "user_id long, ts timestamp_ntz, value double",
    )
    hl = 3600  # 1 hour
    out = recency_weighted_scores(df, halflife_seconds=hl).collect()[0]
    now_min = max(offsets)
    total = 0
    for o, v in zip(offsets, vals):
        k = (now_min - o) * 60 // hl
        # model the operator exactly: quantize each decayed term at 1e-6
        total += int(np.floor(float(v) * 2.0 ** -int(k) * 1e6 + 0.5))
    assert out.recency_score == total / 1e6
    assert out.n_events == len(vals)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_nodes=st.integers(min_value=3, max_value=14),
    p_edge=st.floats(min_value=0.1, max_value=0.9),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=10, deadline=None)
def test_triangle_stats_matches_python_enumeration(
    spark_session_cached, seed, n_nodes, p_edge
):
    from hnsw_spark.operators.graph_stats import triangle_stats

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    edges = [
        (a, b)
        for a in range(n_nodes)
        for b in range(a + 1, n_nodes)
        if rng.random() < p_edge
    ]
    if not edges:
        edges = [(0, 1)]
    adj = {n: set() for n in range(n_nodes)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect_tri = sum(
        1
        for a, b in edges
        for c in (adj[a] & adj[b])
        if c > b
    )
    expect_wedges = sum(
        len(v) * (len(v) - 1) // 2 for v in adj.values()
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    [r] = triangle_stats(df).collect()
    assert r.n_triangles == expect_tri
    assert r.n_wedges == expect_wedges
    assert r.n_edges == len(edges)


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    vocab=st.integers(min_value=2, max_value=12),
    n_docs=st.integers(min_value=2, max_value=10),
    threshold=st.sampled_from([0.4, 0.6, 0.85]),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=8, deadline=None)
def test_prefix_filter_equals_brute_on_random_docs(
    spark_session_cached, seed, vocab, n_docs, threshold
):
    from hnsw_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = [
        (i, " ".join(rng.choice(words, size=rng.integers(3, 12))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    brute = {
        (r.id_a, r.id_b, r.n_common)
        for r in ngram_jaccard_pairs(df, n=2, threshold=threshold).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.n_common)
        for r in jaccard_prefix_pairs(df, n=2, threshold=threshold).collect()
    }
    assert pref == brute


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=8, deadline=None)
def test_count_min_never_undercounts_random_streams(
    spark_session_cached, seed
):
    from hnsw_spark.operators.sketches import count_min_estimate

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    toks = [f"v{rng.integers(0, 30)}" for _ in range(400)]
    from collections import Counter

    exact = Counter(toks)
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    probes = spark.createDataFrame(
        [(t,) for t in exact], "token string"
    )
    got = {
        r.token: r.est
        for r in count_min_estimate(df, probes, "token").collect()
    }
    for tok, n in exact.items():
        assert got[tok] >= n, tok


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_events=st.integers(min_value=2, max_value=40),
)
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=8, deadline=None)
def test_twap_matches_python_model(spark_session_cached, seed, n_events):
    from hnsw_spark.operators.temporal import time_weighted_avg

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    t = dt.datetime(2024, 1, 1)
    rows, model = [], []
    for i in range(n_events):
        t += dt.timedelta(microseconds=int(rng.integers(1, 10_000_000)))
        v = float(np.round(rng.uniform(0, 500), 2))
        rows.append((i, t, "g", v))
        model.append((t, v))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    [r] = time_weighted_avg(df).collect()
    # python model: exact integer arithmetic, identical conventions
    us = dt.timedelta(microseconds=1)
    total = sum(
        (model[i + 1][0] - model[i][0]) // us for i in range(n_events - 1)
    )
    wsum = sum(
        ((model[i + 1][0] - model[i][0]) // us)
        * int(np.floor(model[i][1] * 10_000 + 0.5))
        for i in range(n_events - 1)
    )
    assert r.total_dur_us == total
    assert r.twap_fp == (wsum // total if total > 0 else None)


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(suppress_health_check=[HealthCheck.function_scoped_fixture], max_examples=6, deadline=None)
def test_dsir_scores_match_python_model(spark_session_cached, seed):
    import hashlib
    import math
    from collections import Counter

    from hnsw_spark.operators.curation import dsir_select

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(15)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 20))),
         "tgt" if rng.random() < 0.3 else "bg")
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        r.doc_id: r
        for r in dsir_select(
            df, target_value="tgt", n_buckets=64
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    raw, tgt = Counter(), Counter()
    per_doc = {}
    for i, text, src in docs:
        c = Counter(bucket(t) for t in text.lower().split() if t)
        per_doc[i] = c
        raw.update(c)
        if src == "tgt":
            tgt.update(c)
    T, R = sum(tgt.values()), sum(raw.values())

    def q(num, den):
        return math.floor(math.log(num / den) * 1e6 + 0.5)

    lam = {
        b: q(tgt.get(b, 0) + 1.0, T + 64.0) - q(raw[b] + 1.0, R + 64.0)
        for b in raw
    }
    for i, _, _ in [d for d in docs]:
        c = per_doc[i]
        n = sum(c.values())
        if n == 0:
            assert got[i].n_tokens == 0 and got[i].score_fp is None
            continue
        si = sum(tf * lam[b] for b, tf in c.items())
        assert got[i].n_tokens == n, i
        assert got[i].score_fp == math.floor(si / n), i


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(1, 4)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_ranking_metrics_matches_python_reference(spark, qrels_rows, result_rows):
    """ndcg/mrr/dcg agree with a direct python evaluation on random inputs,
    and ndcg is always within [0, 1]."""
    import math as m

    from hnsw_spark.operators.ranking import ranking_metrics

    k = 5
    # system ranking: per query, rank result ids in listed order
    by_q = {}
    for q, i in result_rows:
        by_q.setdefault(q, [])
        if i not in by_q[q]:
            by_q[q].append(i)
    res = [
        (q, i, r + 1) for q, ids in by_q.items() for r, i in enumerate(ids)
    ]
    jud = [(q, i, rel) for q, i, rel in qrels_rows]
    res_df = spark.createDataFrame(res, "query_id long, id long, rank int")
    jud_df = spark.createDataFrame(jud, "query_id long, id long, rel int")
    got = {
        r["query_id"]: r
        for r in ranking_metrics(res_df, jud_df, k=k).collect()
    }
    judged = {}
    for q, i, rel in jud:
        judged.setdefault(q, {})[i] = rel
    assert set(got) == set(judged)  # every judged query gets a row
    for q, rels in judged.items():
        ranked = [(i, r + 1) for r, i in enumerate(by_q.get(q, []))][:k]
        hits = [(rank, rels[i]) for i, rank in ranked if i in rels]
        dcg = sum(rel / m.log2(rank + 1) for rank, rel in hits)
        ideal = sorted(rels.values(), reverse=True)[:k]
        idcg = sum(rel / m.log2(r + 2) for r, rel in enumerate(ideal))
        row = got[q]
        assert row["hits_at_k"] == len(hits)
        assert row["mrr"] == pytest.approx(
            1.0 / min(r for r, _ in hits) if hits else 0.0
        )
        assert row["dcg"] == pytest.approx(dcg)
        assert row["idcg"] == pytest.approx(idcg)
        assert 0.0 <= row["ndcg"] <= 1.0 + 1e-12
        assert row["ndcg"] == pytest.approx(dcg / idcg if idcg else 0.0)


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=4, max_size=40),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_containment_matches_python_reference(spark, texts):
    """containment_pairs equals the brute-force set computation."""
    from hnsw_spark.operators.dedup import containment_pairs

    n = 2
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(docs, n=n, threshold=0.4).collect()
    }

    def sh(t):
        w = [x for x in t.lower().split() if x]
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    expect = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= 0.4:
                expect[(a, b)] = (len(sa & sb), len(sa), len(sb), c)
    assert set(got) == set(expect)
    for key, (n_common, size_a, size_b, c) in expect.items():
        row = got[key]
        assert (row["n_common"], row["size_a"], row["size_b"]) == (
            n_common,
            size_a,
            size_b,
        )
        assert row["containment"] == pytest.approx(c)


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    max_examples=10,
    deadline=None,
)
def test_scd2_enrich_matches_python_model(spark_session_cached, seed):
    """scd2_intervals + scd2_asof_enrich == a pure-Python as-of model on
    random event feeds — INCLUDING same-timestamp state flips (the rng
    draws ts from a tiny range on purpose), where interval chaining needs
    the run_id tiebreak to stay deterministic."""
    from hnsw_spark.operators.temporal import scd2_intervals
    from hnsw_spark.streaming.enrich import scd2_asof_enrich

    spark = spark_session_cached
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 24))
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            int(i),
            int(rng.integers(0, 3)),  # few users -> long histories
            t0 + dt.timedelta(seconds=int(rng.integers(0, 8))),  # many ties
            str(rng.choice(["A", "B"])),
        )
        for i in range(n)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )

    # python model: replay each user's feed ordered by (ts, event_id); an
    # event's as-of state is the state of the run whose interval holds it.
    # Runs collapse consecutive same-state events; interval k is
    # [min_ts(run k), min_ts(run k+1)).
    by_user: dict[int, list] = {}
    for eid, uid, ts, typ in rows:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    expect: dict[int, str | None] = {}
    intervals: dict[int, list] = {}
    for uid, evs in by_user.items():
        evs.sort()
        runs = []
        for ts, eid, typ in evs:
            if not runs or runs[-1][0] != typ:
                runs.append((typ, ts))
        ivs = [
            (state, start, runs[k + 1][1] if k + 1 < len(runs) else None)
            for k, (state, start) in enumerate(runs)
        ]
        intervals[uid] = ivs
        for ts, eid, typ in evs:
            hit = [
                s
                for s, lo, hi in ivs
                if lo <= ts and (hi is None or ts < hi)
            ]
            assert len(hit) <= 1  # SCD2 intervals partition the timeline
            expect[eid] = hit[0] if hit else None

    dim = scd2_intervals(ev)
    got = {
        r.event_id: r.state
        for r in scd2_asof_enrich(
            ev.select("event_id", "user_id", "ts"), dim
        ).collect()
    }
    assert got == expect
