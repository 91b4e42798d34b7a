"""Round-6 event-analytics batch vs pure-Python references: OHLC picks,
trending rank ties, journey-path assembly, and CDC diff op classification."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries():
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES


def _events(spark):
    from hnsw_spark.sources.tables import load_table

    return load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).collect()


def test_ohlc_matches_python_reference(spark):
    out = {
        (r["bar_hour"], r["event_type"]): r
        for r in _queries()["ohlc_bars"](spark, SF).collect()
    }
    bars: dict[tuple, list] = {}
    for r in _events(spark):
        key = (r["ts"].replace(minute=0, second=0, microsecond=0), r["event_type"])
        bars.setdefault(key, []).append(r)
    assert len(out) == len(bars)
    for key, rows in bars.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        got = out[key]
        assert got["open"] == rows[0]["value"]
        assert got["close"] == rows[-1]["value"]
        assert got["high"] == max(r["value"] for r in rows)
        assert got["low"] == min(r["value"] for r in rows)
        assert got["n_events"] == len(rows)
        assert got["volume_fp"] == sum(
            math.floor(r["value"] * 1_000_000.0 + 0.5) for r in rows
        )


def test_trending_rank_is_count_desc_type_asc(spark):
    rows = _queries()["trending_topn"](spark, SF).collect()
    by_win: dict = {}
    for r in rows:
        by_win.setdefault(r["win_start"], []).append(r)
    for win, rs in by_win.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["n"], r["event_type"]) for r in rs]
        assert keys == sorted(keys), win
        assert len(rs) <= 3
        # win_end is exactly one hour after win_start (tumbling window)
        assert (r["win_end"] - r["win_start"]).total_seconds() == 3600


def test_top_event_paths_reference(spark):
    out = _queries()["top_event_paths"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in _events(spark):
        by_user.setdefault(r["user_id"], []).append(r)
    census: dict[str, int] = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        path = ">".join(r["event_type"] for r in rows[:3])
        census[path] = census.get(path, 0) + 1
    expect = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["path"], r["n_users"]) for r in out] or expect == []
    got = sorted(
        ((r["path"], r["n_users"]) for r in out), key=lambda kv: (-kv[1], kv[0])
    )
    assert got == expect


def test_snapshot_diff_ops(spark):
    rows = _queries()["snapshot_diff_cdc"](spark, SF).collect()
    from hnsw_spark.sources.tables import load_table

    orders = load_table(spark, SF, "orders").collect()
    cut = None
    import datetime

    cut = datetime.datetime(1998, 1, 1)
    s1: dict[int, list] = {}
    s2: dict[int, list] = {}
    for o in orders:
        fp = math.floor(o["o_totalprice"] * 100.0 + 0.5)
        s2.setdefault(o["o_custkey"], []).append(fp)
        if o["o_orderdate"] < cut:
            s1.setdefault(o["o_custkey"], []).append(fp)
    expect = {}
    for k in set(s1) | set(s2):
        a, b = s1.get(k), s2.get(k)
        if a is None:
            expect[k] = ("insert", 0, len(b), 0, sum(b))
        elif b is None:
            expect[k] = ("delete", len(a), 0, sum(a), 0)
        elif (len(a), sum(a)) != (len(b), sum(b)):
            expect[k] = ("update", len(a), len(b), sum(a), sum(b))
    got = {
        r["custkey"]: (
            r["op"],
            r["n_orders_before"],
            r["n_orders_after"],
            r["total_fp_before"],
            r["total_fp_after"],
        )
        for r in rows
    }
    assert got == expect
    # every op present is one of the CDC verbs; inserts have empty before
    for k, (op, nb, na, fb, fa) in got.items():
        assert op in ("insert", "delete", "update")
        if op == "insert":
            assert (nb, fb) == (0, 0)


def test_watermark_lateness_two_level_equals_naive(spark):
    """The bucketed prefix-max must equal the naive single-window running
    max row-for-row (associativity proof by example)."""
    rows = _queries()["watermark_lateness_report"](spark, SF).collect()
    ev = sorted(_events(spark), key=lambda r: r["event_id"])
    run, naive = None, {}
    for r in ev:
        run = r["ts"] if run is None or r["ts"] > run else run
        hour = r["ts"].replace(minute=0, second=0, microsecond=0)
        late = int((run - r["ts"]).total_seconds() * 1_000_000)
        n, nl, mx = naive.get(hour, (0, 0, 0))
        naive[hour] = (
            n + 1,
            nl + (1 if late > 3_600_000_000 else 0),
            max(mx, late),
        )
    got = {
        r["event_hour"]: (r["n_events"], r["n_late_1h"], r["max_late_us"])
        for r in rows
    }
    assert got == naive


def test_user_rfm_scores_reference(spark):
    rows = {r["user_id"]: r for r in _queries()["user_rfm_scores"](spark, SF).collect()}
    ev = _events(spark)
    agg: dict[int, list] = {}
    for r in ev:
        a = agg.setdefault(r["user_id"], [None, 0, 0])
        a[0] = r["ts"] if a[0] is None or r["ts"] > a[0] else a[0]
        a[1] += 1
        a[2] += math.floor(r["value"] * 1_000_000.0 + 0.5)
    now = max(a[0] for a in agg.values())
    m = {
        u: (
            int((now - a[0]).total_seconds()),
            a[1],
            a[2],
        )
        for u, a in agg.items()
    }
    n = len(m)

    def scores(key, reverse):
        order = sorted(m, key=lambda u: (m[u][key] * (-1 if reverse else 1), u))
        return {u: 5 - (5 * i) // n for i, u in enumerate(order)}

    r_s, f_s, m_s = scores(0, False), scores(1, True), scores(2, True)
    assert set(rows) == set(m)
    for u, r in rows.items():
        assert (r["recency_s"], r["frequency"], r["monetary_fp"]) == m[u]
        assert (r["r_score"], r["f_score"], r["m_score"]) == (
            r_s[u],
            f_s[u],
            m_s[u],
        )
