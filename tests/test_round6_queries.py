"""Round-6 query batch vs pure-Python / compositional references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries():
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES


def test_calibration_bins_python_reference(spark):
    out = {r["bin"]: r for r in _queries()["calibration_bins"](spark, SF).collect()}
    from hnsw_spark.operators.curation import quality_prob
    from hnsw_spark.queries.curation import _KS_A
    from hnsw_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF, "documents")
        .select(
            F.col("source").isin(*_KS_A).alias("a"),
            quality_prob("text").alias("p"),
        )
        .collect()
    )
    bins: dict[int, list] = {}
    for r in rows:
        p_fp = math.floor(r["p"] * 1_000_000.0 + 0.5)
        b = min(p_fp // 100_000, 9)
        bins.setdefault(b, []).append((0 if r["a"] else 1, p_fp))
    assert set(out) == set(bins)
    n_total = len(rows)
    ece_num = 0
    for b, members in bins.items():
        n_pos = sum(y for y, _ in members)
        sum_p = sum(p for _, p in members)
        ece_num += abs(n_pos * 1_000_000 - sum_p)
        got = out[b]
        assert (got["n"], got["n_pos"], got["sum_p_fp"]) == (
            len(members),
            n_pos,
            sum_p,
        )
        assert got["gap_fp"] == abs(n_pos * 1_000_000 - sum_p)
    for b in bins:
        assert out[b]["ece"] == round(ece_num / (n_total * 1_000_000.0), 6)


def test_lsh_incremental_is_cross_split_restriction(spark):
    """Incremental candidates == the full self-join pairs restricted to
    (new, corpus) cross-split membership — no pair invented, none lost."""
    from hnsw_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_incremental_candidates,
    )
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 200)
    new_b = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    knobs = dict(num_perm=8, bands=4, n=3, max_bucket=None)
    inc = {
        (r["new_id"], r["corpus_id"]): r["n_bands"]
        for r in lsh_incremental_candidates(new_b, corpus, **knobs).collect()
    }
    full = {}
    for r in lsh_candidate_pairs(docs, **knobs).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 2 == 1 and b % 2 == 0:
            full[(a, b)] = r["n_bands"]
        elif b % 2 == 1 and a % 2 == 0:
            full[(b, a)] = r["n_bands"]
    assert inc == full


def test_lsh_incremental_never_pairs_within_batch(spark):
    from hnsw_spark.operators.dedup import lsh_incremental_candidates
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 100)
    # duplicate texts INSIDE the new batch must not pair with each other
    new_b = docs.limit(0).union(docs.filter(F.col("doc_id").isin(1, 3)))
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    out = lsh_incremental_candidates(
        new_b, corpus, num_perm=8, bands=4, n=3
    ).collect()
    for r in out:
        assert r["new_id"] % 2 == 1 and r["corpus_id"] % 2 == 0
