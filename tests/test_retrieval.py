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


def test_mmr_diversifies_clustered_candidates(spark):
    """Three tight clusters: plain top-k would take all of cluster A first;
    MMR must interleave clusters."""
    import numpy as np
    from pyspark.sql import functions as F

    from hnsw_spark.functions.similarity import cosine_similarity
    from hnsw_spark.operators.retrieval import diversify_mmr

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((3, 32)) * 5
    vecs = [
        (c * 10 + i, (centers[c] + rng.standard_normal(32) * 0.01).tolist())
        for c in range(3)
        for i in range(4)
    ]
    # relevance: cluster 0 slightly above 1 above 2, within-cluster spread tiny
    cand_rows = [(0, vid, 1.0 - 0.001 * (vid // 10) - 1e-5 * (vid % 10)) for vid, _ in vecs]
    cand = spark.createDataFrame(cand_rows, "query_id long, id long, rel double")
    emb = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in vecs],
        "id long, embedding array<float>",
    )
    a = emb.select(F.lit(0).cast("long").alias("query_id"),
                   F.col("id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).select(
        "query_id", "id_a", "id_b", cosine_similarity("va", "vb").alias("sim")
    )
    out = sorted(
        diversify_mmr(cand, pairs, k=6, lam_num=5, lam_den=10).collect(),
        key=lambda r: r.mmr_rank,
    )
    first_three_clusters = [r.id // 10 for r in out[:3]]
    assert sorted(first_three_clusters) == [0, 1, 2]  # one pick per cluster
    assert out[0].id == 0  # rank 1 = pure argmax relevance


def test_mmr_k_caps_at_candidate_count(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from hnsw_spark.operators.retrieval import diversify_mmr

    cand = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8)], "query_id long, id long, rel double"
    )
    pairs = spark.createDataFrame(
        [(1, 10, 11, 0.5), (1, 11, 10, 0.5), (1, 10, 10, 1.0), (1, 11, 11, 1.0)],
        "query_id long, id_a long, id_b long, sim double",
    )
    out = diversify_mmr(cand, pairs, k=10).collect()
    assert len(out) == 2
    assert {r.mmr_rank for r in out} == {1, 2}
