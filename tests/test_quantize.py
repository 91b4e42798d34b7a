"""Unit tests for int8 embedding quantization."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hnsw_spark.functions.quantize import (
    dequantize,
    quant_scale,
    quantize,
    reconstruction_error,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, v array<float>")


def test_quantize_roundtrip_error_bound(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    df = _vecs(spark, rows)
    out = (
        df.withColumn("scale", quant_scale("v"))
        .withColumn("q", quantize("v", F.col("scale")))
        .withColumn("err", reconstruction_error("v", F.col("q"), F.col("scale")))
        .withColumn("back", dequantize("q", "scale"))
        .collect()
    )
    for r in out:
        assert all(-127 <= q <= 127 for q in r.q)
        assert r.err <= r.scale / 2 + 1e-12  # symmetric rounding bound
        # the max-magnitude element maps exactly to ±127
        assert max(abs(q) for q in r.q) == 127
        back = np.array(r.back)
        orig = np.array(r.v)
        assert np.abs(back - orig).max() <= r.scale / 2 + 1e-6


def test_quantize_zero_vector(spark):
    df = _vecs(spark, [(0, [0.0, 0.0, 0.0])])
    r = (
        df.withColumn("scale", quant_scale("v"))
        .withColumn("q", quantize("v", F.col("scale")))
        .withColumn("back", dequantize("q", "scale"))
        .collect()[0]
    )
    assert r.scale == 0.0
    assert list(r.q) == [0, 0, 0]  # no 0/0 NaN
    assert list(r.back) == [0.0, 0.0, 0.0]
