"""Round-6 third batch (pivot, growth accounting, Pareto) vs pure-Python
references."""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

SF = "/root/testdata/sf0.001"

TYPES = ("click", "error", "purchase", "signup", "view")


def _queries():
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES


def _events(spark):
    from hnsw_spark.sources.tables import load_table

    return load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).collect()


def test_events_type_pivot_python_reference(spark):
    out = {r["day"]: r for r in _queries()["events_type_pivot"](spark, SF).collect()}
    cnt = Counter()
    for r in _events(spark):
        cnt[(r["ts"].date(), r["event_type"])] += 1
    days = {d for d, _ in cnt}
    assert set(out) == days
    for d in days:
        row = out[d]
        for t in TYPES:
            assert row[f"n_{t}"] == cnt.get((d, t), 0), (d, t)
        assert row["n_total"] == sum(cnt.get((d, t), 0) for t in TYPES)


def _monday(d: datetime.date) -> datetime.date:
    return d - datetime.timedelta(days=d.weekday())


def test_growth_accounting_python_reference(spark):
    out = {r["week"]: r for r in _queries()["growth_accounting"](spark, SF).collect()}
    weeks_by_user = defaultdict(set)
    for r in _events(spark):
        weeks_by_user[r["user_id"]].add(_monday(r["ts"].date()))
    active = defaultdict(set)
    new = defaultdict(set)
    retained = defaultdict(set)
    resurrected = defaultdict(set)
    for u, ws in weeks_by_user.items():
        first = min(ws)
        for w in ws:
            active[w].add(u)
            if w == first:
                new[w].add(u)
            elif w - datetime.timedelta(days=7) in ws:
                retained[w].add(u)
            else:
                resurrected[w].add(u)
    assert set(out) == set(active)
    prev = None
    for w in sorted(active):
        row = out[w]
        assert row["n_active"] == len(active[w])
        assert row["n_new"] == len(new[w])
        assert row["n_retained"] == len(retained[w])
        assert row["n_resurrected"] == len(resurrected[w])
        if prev is not None and w - prev == datetime.timedelta(days=7):
            # churned = users active last week who did not return
            assert row["n_churned"] == len(active[prev]) - len(retained[w])
            assert row["n_churned"] == len(active[prev] - active[w])
        else:
            assert row["n_churned"] is None
        prev = w


def test_revenue_pareto_python_reference(spark):
    from hnsw_spark.sources.tables import load_table

    out = {r["decile"]: r for r in _queries()["revenue_pareto"](spark, SF).collect()}
    rev = defaultdict(int)
    for r in load_table(spark, SF, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        rev[r["o_custkey"]] += int(math.floor(r["o_totalprice"] * 10000.0 + 0.5))
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    dec = defaultdict(list)
    for i, (_, fp) in enumerate(ranked):
        dec[int(i * 10 // n) + 1].append(fp)
    assert set(out) == set(dec)
    total = sum(rev.values())
    cum = 0
    for d in sorted(dec):
        row = out[d]
        cum += sum(dec[d])
        assert row["n_customers"] == len(dec[d])
        assert row["revenue"] == sum(dec[d]) / 10000.0
        assert row["cum_share_fp"] == (cum * 1_000_000) // total
    # monotone Lorenz curve ending exactly at 100%
    assert out[max(dec)]["cum_share_fp"] == 1_000_000
    # concentration sanity: the top decile holds the largest share
    assert max(dec, key=lambda d: sum(dec[d])) == 1
