"""Round-5 query batch against pure-Python references: EWMA dyadic
exactness, Mann-Whitney AUC with ties, the Morton interleave, and the
salted-aggregation equality invariant."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def _ref_ewma_fp(values: list[float]) -> int:
    """Python reference: newest-first values, weights 1/2^k, per-term
    floor(v / 2**k * 1e6 + 0.5)."""
    import math

    return sum(
        math.floor(v / (1 << k) * 1_000_000.0 + 0.5)
        for k, v in enumerate(values[:16])
    )


def test_ewma_matches_python_reference(spark):
    from hnsw_spark.queries.relational import ewma_recency_q  # noqa: F401
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    out = {
        r["user_id"]: (r["ewma_fp"], r["n_terms"])
        for r in QUERIES["ewma_recency"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]), reverse=True)
        vals = [r["value"] for r in rows]
        assert out[uid] == (_ref_ewma_fp(vals), min(len(vals), 16)), uid


def _ref_auc(pairs: list[tuple[int, float]]) -> tuple[int, int, int]:
    """(n0, n1, auc_num) by explicit average-rank Mann-Whitney."""
    ranked = sorted(pairs, key=lambda p: p[1])
    # average ranks with ties, scaled by 2 to stay integer
    two_ranks: list[int] = [0] * len(ranked)
    i = 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and ranked[j][1] == ranked[i][1]:
            j += 1
        # ranks i+1 .. j (1-based); average*2 = (i+1+j)
        for t in range(i, j):
            two_ranks[t] = i + 1 + j
        i = j
    n1 = sum(1 for g, _ in ranked if g == 1)
    n0 = len(ranked) - n1
    two_r1 = sum(tr for tr, (g, _) in zip(two_ranks, ranked) if g == 1)
    return n0, n1, two_r1 - n1 * (n1 + 1)


def test_auc_reference_properties():
    # perfect separation -> auc_num == 2*n0*n1 (AUC = 1)
    n0, n1, num = _ref_auc([(0, 0.1), (0, 0.2), (1, 0.8), (1, 0.9)])
    assert (n0, n1) == (2, 2) and num == 2 * n0 * n1
    # all tied -> AUC = 1/2 exactly
    n0, n1, num = _ref_auc([(0, 0.5), (1, 0.5), (0, 0.5), (1, 0.5)])
    assert num * 2 == 2 * n0 * n1 * 1


def test_quality_auc_matches_python_reference(spark):
    from hnsw_spark.queries.curation import _KS_A
    from hnsw_spark.functions.text import quality_score_w, words
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    [row] = QUERIES["quality_auc"](spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        F.when(F.col("source").isin(*_KS_A), F.lit(0))
        .otherwise(F.lit(1))
        .alias("grp"),
        quality_score_w(F.col("text"), words("text")).alias("q"),
    ).collect()
    n0, n1, num = _ref_auc([(r["grp"], r["q"]) for r in scored])
    assert (row["n0"], row["n1"], row["auc_num"]) == (n0, n1, num)
    assert row["auc_fp"] == math.floor(num / (2 * n0 * n1) * 1e6 + 0.5)


def _ref_morton(x: int, y: int) -> int:
    z = 0
    for b in range(8):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_sql_matches_reference():
    import duckdb

    from hnsw_spark.queries.relational import _morton_sql

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT x, y, {_morton_sql('x', 'y')} AS z FROM "
        "(SELECT (i * 37) % 256 AS x, (i * 91) % 256 AS y "
        " FROM range(64) t(i))"
    ).fetchall()
    for x, y, z in rows:
        assert z == _ref_morton(x, y), (x, y)


def test_salted_aggregation_gate_all_true(spark):
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    rows = QUERIES["salted_aggregation_gate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r["salted_matches"] for r in rows)


def test_bucketed_join_plan_has_no_exchange(spark):
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    rows = QUERIES["bucketed_join_gate"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r["no_shuffle_join"] for r in rows)
