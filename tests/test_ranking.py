"""ranking_metrics (operators/ranking.py) against hand-computed values, and
containment_pairs (operators/dedup.py) against its defining property."""

from __future__ import annotations

import math

import pytest

from hnsw_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from hnsw_spark.operators.ranking import ranking_metrics


def _results(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id long, id long, rel int")


def test_ranking_metrics_hand_computed(spark):
    # q0: system [10, 11, 12]; judged: 11 (rel 3), 12 (rel 1), 99 (rel 2)
    res = _results(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    jud = _qrels(spark, [(0, 11, 3), (0, 12, 1), (0, 99, 2)])
    [m] = ranking_metrics(res, jud, k=3).collect()
    assert m["n_judged"] == 3
    assert m["hits_at_k"] == 2  # 11 and 12 retrieved, 99 missed
    assert m["mrr"] == pytest.approx(1 / 2)  # first hit at rank 2
    dcg = 3 / math.log2(3) + 1 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert m["dcg"] == pytest.approx(dcg)
    assert m["idcg"] == pytest.approx(idcg)
    assert m["ndcg"] == pytest.approx(dcg / idcg)


def test_ranking_metrics_perfect_and_zero(spark):
    res = _results(spark, [(0, 1, 1), (0, 2, 2), (1, 7, 1)])
    jud = _qrels(spark, [(0, 1, 2), (0, 2, 1), (1, 8, 1)])
    rows = {r["query_id"]: r for r in ranking_metrics(res, jud, k=2).collect()}
    assert rows[0]["ndcg"] == pytest.approx(1.0)  # ideal order retrieved
    assert rows[0]["mrr"] == pytest.approx(1.0)
    assert rows[1]["hits_at_k"] == 0  # judged doc never retrieved
    assert rows[1]["mrr"] == 0.0
    assert rows[1]["ndcg"] == 0.0  # all-zero row still present


def test_ranking_metrics_query_missing_from_results(spark):
    res = _results(spark, [(0, 1, 1)])
    jud = _qrels(spark, [(0, 1, 1), (5, 2, 3)])
    rows = {r["query_id"]: r for r in ranking_metrics(res, jud, k=5).collect()}
    assert set(rows) == {0, 5}  # dropped query surfaces with zero metrics
    assert rows[5]["ndcg"] == 0.0 and rows[5]["n_judged"] == 1


def test_ranking_metrics_fixed_point_matches_double(spark):
    res = _results(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    jud = _qrels(spark, [(0, 11, 3), (0, 12, 1), (0, 99, 2)])
    [d] = ranking_metrics(res, jud, k=3).collect()
    [q] = ranking_metrics(res, jud, k=3, gain_scale=1_000_000).collect()
    assert q["dcg"] == round(3 / math.log2(3) * 1e6) + round(
        1 / math.log2(4) * 1e6
    )
    assert q["ndcg"] == pytest.approx(d["ndcg"], abs=1e-5)


def test_containment_detects_quotation(spark):
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "gamma delta epsilon zeta"  # wholly inside `long`
    other = "one two three four five six"
    docs = spark.createDataFrame(
        [(0, long), (1, quote), (2, other)], "doc_id long, text string"
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(docs, n=2, threshold=0.5).collect()
    }
    assert (1, 0) in rows  # quote ⊂ long: containment(quote)=1.0
    assert rows[(1, 0)]["containment"] == pytest.approx(1.0)
    assert (0, 1) not in rows  # long is NOT mostly inside quote
    # the same pair's Jaccard is small — the asymmetry containment exists for
    [jac] = (
        ngram_jaccard_pairs(docs, n=2, threshold=0.0)
        .filter("id_a = 0 and id_b = 1")
        .collect()
    )
    assert jac["jaccard"] < 0.5


def test_containment_max_doc_freq_guard(spark):
    docs = spark.createDataFrame(
        [(i, "common phrase here filler " + str(i)) for i in range(6)],
        "doc_id long, text string",
    )
    # every 2-gram of the shared prefix appears in all 6 docs; capping at 5
    # removes them, leaving no qualifying pairs
    assert containment_pairs(docs, n=2, threshold=0.5, max_doc_freq=5).count() == 0
    assert containment_pairs(docs, n=2, threshold=0.5).count() > 0
