"""Fixture-table loaders (Parquet-first ingest).

The driver materializes TPC-H-ish tables plus ``documents`` and ``embeddings``
at ``/root/testdata/sf*/`` (one parquet per table).  Parquet scans give us
predicate pushdown, column pruning, and vectorized reads for free — the
Spark-native replacement for the reference's fvecs scanners
(src/bench/dataset.ts:65-101), which are still available in
``hnsw_spark.sources.fvecs`` for format parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
