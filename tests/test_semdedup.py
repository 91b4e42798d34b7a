"""SemDeDup keep-min-id semantics and clustered-tier containment."""

from __future__ import annotations

from hnsw_spark.operators.semdedup import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_keep_min_id(spark):
    # 1 ≈ 2 ≈ 3 (same direction), 4 orthogonal: keep 1 and 4
    df = _emb(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.001]),
            (3, [0.5, 0.0]),
            (4, [0.0, 1.0]),
        ],
    )
    out = sorted(r.vec_id for r in semantic_dedup(df, 0.99, exact=True).collect())
    assert out == [1, 4]


def test_zero_norm_rows_always_survive(spark):
    df = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])])
    out = sorted(r.vec_id for r in semantic_dedup(df, 0.9, exact=True).collect())
    assert out == [1, 2]


def test_clustered_survivors_superset_of_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r.vec_id for r in semantic_dedup(emb, 0.3, exact=True).collect()}
    clus = {
        r.vec_id
        for r in semantic_dedup(emb, 0.3, n_clusters=4, n_probe=2).collect()
    }
    assert exact <= clus
