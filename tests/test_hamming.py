"""Binary-quantization tier: sign-bit packing, Hamming kernel, two-stage
search, and the mutual-kNN graph (operators/knn.py, functions/quantize.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hnsw_spark.functions.quantize import binarize, hamming_distance
from hnsw_spark.operators.knn import (
    knn_exact,
    knn_hamming_rerank,
    mutual_knn_pairs,
)


def _emb_df(spark, mats):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mats)],
        "vec_id long, embedding array<float>",
    )


def test_binarize_known_bits(spark):
    v = [0.0] * 64
    v[0] = 1.0   # word 0, bit 0 -> 1
    v[33] = 0.5  # word 1, bit 1 -> 2
    v[5] = -3.0  # negative: bit stays clear
    row = _emb_df(spark, [v]).select(binarize("embedding", 64).alias("c")).first()
    assert row.c == [1, 2]


def test_binarize_word_values_fit_in_32_bits(spark):
    rng = np.random.default_rng(7)
    mats = rng.standard_normal((20, 64))
    rows = (
        _emb_df(spark, mats)
        .select(F.explode(binarize("embedding", 64)).alias("w"))
        .collect()
    )
    assert all(0 <= r.w < 2**32 for r in rows)


def test_hamming_matches_numpy_popcount(spark):
    rng = np.random.default_rng(11)
    mats = rng.standard_normal((16, 64))
    df = _emb_df(spark, mats)
    a = df.select("vec_id", binarize("embedding", 64).alias("code"))
    pairs = (
        a.alias("x")
        .crossJoin(a.alias("y"))
        .select(
            F.col("x.vec_id").alias("ia"),
            F.col("y.vec_id").alias("ib"),
            hamming_distance(F.col("x.code"), F.col("y.code")).alias("h"),
        )
        .collect()
    )
    bits = mats > 0
    for r in pairs:
        assert r.h == int(np.sum(bits[r.ia] != bits[r.ib]))


def test_full_rerank_degenerates_to_exact_knn(spark):
    rng = np.random.default_rng(3)
    mats = rng.standard_normal((40, 64))
    df = _emb_df(spark, mats)
    qs = df.filter(F.col("vec_id") < 4)
    # rerank = N: stage 1 passes every candidate through, so the result must
    # equal the exact tier row-for-row
    got = {
        (r.query_id, r.id): round(r.score, 9)
        for r in knn_hamming_rerank(df, qs, k=5, rerank=40, dim=64).collect()
    }
    want = {
        (r.query_id, r.id): round(r.score, 9)
        for r in knn_exact(df, qs, k=5).collect()
    }
    assert got == want


def test_mutual_knn_pairs_are_reciprocal(spark):
    rng = np.random.default_rng(5)
    mats = rng.standard_normal((30, 16))
    df = _emb_df(spark, mats)
    k = 4
    got = mutual_knn_pairs(df, k=k).collect()
    # brute-force reference: normalized cosine top-k per row, self excluded
    norm = mats / np.linalg.norm(mats, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -np.inf)
    topk = {
        i: set(np.argsort(-sims[i], kind="stable")[:k]) for i in range(30)
    }
    expected = {
        (a, b)
        for a in range(30)
        for b in topk[a]
        if a < b and a in topk[b]
    }
    assert {(r.id_a, r.id_b) for r in got} == expected
    for r in got:
        assert 1 <= r.rank_ab <= k and 1 <= r.rank_ba <= k
        # DataFrame stores float32, the numpy reference is float64
        assert abs(r.score - sims[r.id_a][r.id_b]) < 1e-6
