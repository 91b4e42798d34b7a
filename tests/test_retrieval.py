"""Unit tests for rank-fusion retrieval."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.retrieval import bm25_scores, rrf_fuse


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "id bigint, rank int")


def test_rrf_scores_and_missing_arm_handling(spark):
    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(2, 1), (4, 2)])
    got = {r.id: r.rrf for r in rrf_fuse([a, b], k=60).collect()}
    assert got[1] == pytest.approx(1 / 61)
    assert got[2] == pytest.approx(1 / 62 + 1 / 61)  # both arms
    assert got[3] == pytest.approx(1 / 63)
    assert got[4] == pytest.approx(1 / 62)  # only arm b
    # the doc both arms agree on wins
    assert max(got, key=got.get) == 2


def test_bm25_ranks_matching_docs_sanely(spark):
    """BM25 basics: a doc containing the query term twice outranks one with
    a single hit, a long padded doc scores below a short one with the same
    tf, and docs without any query term are absent."""
    docs = spark.createDataFrame(
        [
            (0, "spark spark engine"),
            (1, "spark engine"),
            (2, "spark " + "filler " * 30),
            (3, "unrelated words entirely"),
        ],
        "doc_id bigint, text string",
    )
    q = spark.createDataFrame([("spark",)], "token string")
    got = {r.id: r.bm25 for r in bm25_scores(docs, q).collect()}
    assert set(got) == {0, 1, 2}  # doc 3 never scored
    assert got[0] > got[1] > got[2]
    assert all(v > 0 for v in got.values())


def test_rrf_single_arm_and_empty_guard(spark):
    a = _ranked(spark, [(7, 1)])
    got = rrf_fuse([a]).collect()
    assert [(r.id, round(r.rrf, 6)) for r in got] == [(7, round(1 / 61, 6))]
    with pytest.raises(ValueError):
        rrf_fuse([])
