"""PCA operator vs direct numpy decomposition."""

from __future__ import annotations

import numpy as np

from hnsw_spark.operators.pca import covariance_stats, pca_fit, pca_transform


def _load(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float64) for r in df.collect()]
    )
    return df, x


def test_covariance_matches_numpy(spark):
    df, x = _load(spark)
    n, mean, cov = covariance_stats(df)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(0), rtol=0, atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-8, atol=1e-10)


def test_fit_matches_numpy_spectrum(spark):
    df, x = _load(spark)
    model = pca_fit(df, k=4)
    want = np.sort(np.linalg.eigvalsh(np.cov(x.T, bias=True)))[::-1]
    np.testing.assert_allclose(model["eigenvalues"], want, rtol=1e-8, atol=1e-10)
    # trace identity: spectrum sums to total variance
    assert abs(model["eigenvalues"].sum() - x.var(0).sum()) < 1e-8


def test_transform_matches_matmul_and_whiten_unit_variance(spark):
    df, x = _load(spark)
    model = pca_fit(df, k=4)
    out = pca_transform(df, model, out_col="p").orderBy("vec_id").collect()
    got = np.stack([np.asarray(r.p, dtype=np.float64) for r in out])
    want = (x - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)  # float32 out
    white = pca_transform(df, model, out_col="p", whiten=True).collect()
    w = np.stack([np.asarray(r.p, dtype=np.float64) for r in white])
    np.testing.assert_allclose(w.var(0), np.ones(4), rtol=1e-3, atol=1e-3)


def test_partition_invariance(spark):
    df, _ = _load(spark)
    a = pca_fit(df, k=3)
    b = pca_fit(df.repartition(7), k=3)
    np.testing.assert_allclose(a["eigenvalues"], b["eigenvalues"], rtol=1e-9)
    np.testing.assert_allclose(a["components"], b["components"], rtol=0, atol=1e-9)
