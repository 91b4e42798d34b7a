"""Round-6 second batch (event analytics + IR) vs pure-Python references."""

from __future__ import annotations

from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"


def _queries():
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES


def _events(spark):
    from hnsw_spark.sources.tables import load_table

    return load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).collect()


def _docs(spark):
    from hnsw_spark.sources.tables import load_table

    return load_table(spark, SF, "documents").select("doc_id", "text").collect()


def _floor_median(vals):
    s = sorted(vals)
    return s[int(0.5 * (len(s) - 1))]


def test_event_transitions_python_reference(spark):
    out = {
        (r["from_type"], r["to_type"]): r
        for r in _queries()["event_transitions"](spark, SF).collect()
    }
    seqs = defaultdict(list)
    for r in _events(spark):
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    cnt = Counter()
    for s in seqs.values():
        s.sort()
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            cnt[(a, b)] += 1
    assert set(out) == set(cnt)
    tot = Counter()
    for (a, _), n in cnt.items():
        tot[a] += n
    for k, n in cnt.items():
        assert out[k]["n"] == n
        assert out[k]["prob_fp"] == (n * 1_000_000) // tot[k[0]]


def test_dau_wau_stickiness_python_reference(spark):
    out = {r["day"]: r for r in _queries()["dau_wau_stickiness"](spark, SF).collect()}
    du = {(r["ts"].date(), r["user_id"]) for r in _events(spark)}
    days = sorted({d for d, _ in du})
    assert set(out) == set(days)
    for d in days:
        dau = sum(1 for dd, _ in du if dd == d)
        wau = len({u for dd, u in du if 0 <= (d - dd).days <= 6})
        assert out[d]["dau"] == dau
        assert out[d]["wau"] == wau
        assert out[d]["stickiness_fp"] == (dau * 1_000_000) // wau


def test_robust_outlier_days_python_reference(spark):
    out = {r["day"]: r for r in _queries()["robust_outlier_days"](spark, SF).collect()}
    daily = Counter(r["ts"].date() for r in _events(spark))
    med = _floor_median(daily.values())
    mad = _floor_median([abs(n - med) for n in daily.values()])
    assert set(out) == set(daily)
    for d, n in daily.items():
        r = out[d]
        assert (r["n_events"], r["med"], r["mad"]) == (n, med, mad)
        if mad > 0:
            z = (abs(n - med) * 1_000_000) // mad
            assert r["z_fp"] == z
            assert r["is_outlier"] == (1 if z >= 3_000_000 else 0)
        else:
            assert r["z_fp"] is None and r["is_outlier"] == 0


def test_phrase_search_python_reference(spark):
    out = {r["doc_id"]: r for r in _queries()["phrase_search"](spark, SF).collect()}
    ref = {}
    for r in _docs(spark):
        w = r["text"].strip().lower().split()
        hits = [i for i in range(len(w) - 1) if w[i] == "table" and w[i + 1] == "scan"]
        if hits:
            ref[r["doc_id"]] = (len(hits), hits[0] + 1)
    assert set(out) == set(ref)
    for d, (n, first) in ref.items():
        assert (out[d]["n_occurrences"], out[d]["first_pos"]) == (n, first)


def test_phrase_match_three_tokens(spark):
    """k-token chaining: a 3-word phrase must require all three contiguous."""
    from hnsw_spark.operators.retrieval import phrase_match

    df = spark.createDataFrame(
        [
            (1, "a table scan is fast table scan slow"),
            (2, "fast table scan here"),
            (3, "table scan fast nope table fast scan"),
            (4, "no phrase at all"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_match(df, "fast table scan").collect()
    }
    assert got == {1: (1, 5), 2: (1, 1)}


def test_doc_keywords_python_reference(spark):
    out = defaultdict(list)
    for r in _queries()["doc_keywords"](spark, SF).collect():
        out[r["doc_id"]].append((r["rank"], r["word"], r["tf"], r["df"], r["score_fp"]))
    tf = defaultdict(Counter)
    for r in _docs(spark):
        tf[r["doc_id"]].update(r["text"].strip().lower().split())
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    assert set(out) == set(tf)
    for d, c in tf.items():
        scored = sorted(
            (((t * 1_000_000) // df[w], w, t) for w, t in c.items()),
            key=lambda x: (-x[0], x[1]),
        )
        top = [
            (i + 1, w, t, df[w], s)
            for i, (s, w, t) in enumerate(scored[:3])
        ]
        assert sorted(out[d]) == top
