"""Random projection (Johnson–Lindenstrauss) for embedding dimensionality
reduction — the cheap pre-ANN shrink that preserves pairwise distances
within (1±ε) with overwhelming probability at d_out = O(ln n / ε²).

Design for exactness and scale:
- The projection matrix is the Achlioptas ±1 ensemble, expanded
  DETERMINISTICALLY from a seed (md5 parity of ``salt:j:k``), so every
  engine — and the DuckDB oracle — regenerates the identical matrix; no
  matrix is shuffled or broadcast (it rides inside the plan as literal
  sign arrays: out_dim × d_in bytes of plan, zero data movement).
- Each output component is Σⱼ vⱼ·s_jk / √d_out computed over FIXED-POINT
  quantized inputs (qⱼ = floor(vⱼ·10⁶ + 0.5), exact BIGINT accumulation),
  so the result is identical under any addition order / partitioning —
  the same engine-invariance recipe as unigram_logprob's ln accumulation.
- Pure per-row Catalyst expressions: the projection fuses into the scan
  stage, zero shuffles at any corpus size.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def projection_signs(d_in: int, d_out: int, salt: str = "jl") -> list[list[int]]:
    """The ±1 matrix, column-major: signs[k][j] for output dim k, input j.
    md5 parity of 'salt:j:k' — reproducible anywhere, including in SQL."""
    return [
        [
            1
            if hashlib.md5(f"{salt}:{j}:{k}".encode()).digest()[0] % 2 == 0
            else -1
            for j in range(d_in)
        ]
        for k in range(d_out)
    ]


def project_expr(vec: Column | str, signs_k: list[int]) -> Column:
    """One output component: Σⱼ floor(vⱼ·10⁶+0.5)·s_jk as exact BIGINT,
    then /10⁶·(1/√d_out is applied by the caller)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    lit = F.array(*[F.lit(s) for s in signs_k])
    q = F.transform(c, lambda x: F.floor(x * 1000000.0 + 0.5).cast("long"))
    prod = F.zip_with(q, lit, lambda a, s: a * s)
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, x: acc + x)


def random_projection(
    df: DataFrame,
    d_in: int,
    d_out: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "jl",
) -> DataFrame:
    """Project ``vec_col`` (length ``d_in``) to ``d_out`` dims → long form
    (id, k, value): one row per output component, value already scaled by
    1/√d_out, emitted raw (exact for power-of-two d_out).  Long form keeps the
    output array-free (the correctness harness can't sort arrays) and
    feeds straight into groupBy-pivot or array_agg when a caller wants
    vectors back."""
    scale = 1.0 / (d_out**0.5)
    signs = projection_signs(d_in, d_out, salt)
    comps = F.array(
        *[
            (project_expr(vec_col, signs[k]).cast("double") / 1000000.0 * scale)
            for k in range(d_out)
        ]
    )
    # raw exact double: Σq·s is a fixed-point BIGINT and 1/√d_out is a
    # power-of-two reciprocal for the supported d_out, so the division and
    # scale are IEEE-exact — no rounding needed (the oracle-facing query
    # wrapper emits the fixed-point form; rounding HERE once hid a
    # HALF_UP/HALF_EVEN midpoint hazard at scale 6)
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(comps).alias("k", "_v"),
    ).select("id", "k", F.col("_v").alias("value"))
