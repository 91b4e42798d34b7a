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


def test_random_projection_preserves_pairwise_distances(spark):
    """JL property on real fixture embeddings: 64 -> 16 dims keeps pairwise
    euclidean distances within a generous (1 +/- 0.6) band (d_out=16 is
    aggressive; the bound is deterministic here because the sign matrix is
    seeded).  Also pins shape, determinism, and the zero-shuffle plan."""
    import numpy as np

    from hnsw_spark.functions.projection import (
        projection_signs,
        random_projection,
    )
    from hnsw_spark.plans.audit import plan_facts
    from hnsw_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        "vec_id < 40"
    )
    out = random_projection(emb, d_in=64, d_out=16)
    assert plan_facts(out).shuffles == 0
    rows = out.collect()
    assert len(rows) == 40 * 16
    vecs = {}
    for r in rows:
        vecs.setdefault(r.id, [0.0] * 16)[r.k] = r.value
    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    ids = sorted(orig)
    ratios = []
    for i in range(0, 30, 3):
        for j in range(i + 1, 30, 7):
            a, b = ids[i], ids[j]
            d0 = np.linalg.norm(orig[a] - orig[b])
            d1 = np.linalg.norm(np.array(vecs[a]) - np.array(vecs[b]))
            if d0 > 0:
                ratios.append(d1 / d0)
    assert ratios and all(0.4 < r < 1.6 for r in ratios), ratios
    # deterministic: same salt -> same matrix
    assert projection_signs(8, 2, "s") == projection_signs(8, 2, "s")
    assert projection_signs(8, 2, "s") != projection_signs(8, 2, "t")
