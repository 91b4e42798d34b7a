"""Ingest-time validation — the reference's insert guards as one Spark pass.

Parity targets (src/main.ts:234-248):
- dimension consistency: declared ``d`` or inferred from the first vector
  (insertion order = ascending id); any mismatch raises the reference's
  exact message ``'All vectors must be of the same dimension'``
  (src/main.ts:235-238, schema inference §1.3 of SURVEY.md).
- duplicate-id rejection: ``addPoint`` throws on an already-present id
  (src/main.ts:240-242).

Both checks run in a single aggregation job over the corpus (no collect of
data rows — only a handful of scalars come back to the driver), so the pass
costs one scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ValidationError(ValueError):
    pass


def validate_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d: int | None = None,
) -> int:
    """Validate (id, vector) ingest; returns the (declared or inferred)
    dimension.  Raises ValidationError on any violation."""
    sizes = df.select(
        F.col(id_col).alias("id"), F.size(F.col(vec_col)).alias("sz")
    )
    stats = sizes.agg(
        F.count("*").alias("n"),
        F.countDistinct("sz").alias("n_dims"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        F.countDistinct("id").alias("n_ids"),
        F.min_by("sz", "id").alias("first_sz"),  # insertion order = id asc
    ).first()
    if stats.n == 0:
        if d is None:
            raise ValidationError("cannot infer dimension from an empty corpus")
        return d
    inferred = d if d is not None else int(stats.first_sz)
    if stats.n_dims > 1 or stats.min_sz != inferred:
        # the reference's exact message (src/main.ts:236)
        raise ValidationError("All vectors must be of the same dimension")
    if stats.n_ids != stats.n:
        raise ValidationError(
            f"duplicate ids: {stats.n - stats.n_ids} rows collide "
            "(reference rejects duplicate inserts, src/main.ts:240-242)"
        )
    return inferred


def duplicate_ids(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The offending rows, for diagnostics: (id, n) with n > 1."""
    return (
        df.groupBy(F.col(id_col).alias("id"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
