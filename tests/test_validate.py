"""Ingest validation guards (src/main.ts:234-248 parity)."""

from __future__ import annotations

import pytest

from hnsw_spark.operators.validate import (
    ValidationError,
    duplicate_ids,
    validate_vectors,
)


def test_dimension_inferred_and_ok(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    assert validate_vectors(df) == 2
    assert validate_vectors(df, d=2) == 2


def test_dimension_mismatch_raises_reference_message(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValidationError, match="All vectors must be of the same dimension"):
        validate_vectors(df)
    # declared d that contradicts the data also raises (src/main.ts:235-237)
    ok = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValidationError):
        validate_vectors(ok, d=3)


def test_duplicate_ids_raise_and_report(spark):
    df = spark.createDataFrame(
        [(1, [1.0]), (1, [2.0]), (2, [3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValidationError, match="duplicate ids"):
        validate_vectors(df)
    bad = duplicate_ids(df).collect()
    assert len(bad) == 1 and bad[0].id == 1 and bad[0].n == 2


def test_empty_requires_declared_dimension(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValidationError, match="empty"):
        validate_vectors(df)
    assert validate_vectors(df, d=8) == 8
