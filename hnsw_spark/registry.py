"""Query registry backing ``__spark_entry__.py``.

Each registered query is one implemented operator from SURVEY.md §2: a
callable ``(spark, sf_dir) -> DataFrame`` plus (where ANSI-SQL-expressible) a
DuckDB oracle string over the same parquet tables.  Column names/aliases match
between the Spark plan and the oracle, and floating outputs are rounded to a
fixed scale in BOTH so the driver's order-insensitive value hash compares
equal.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import hnsw_spark.queries.vector  # noqa: F401

    for mod in (
        "hnsw_spark.queries.evaluation",
        "hnsw_spark.queries.text",
        "hnsw_spark.queries.dedup",
        "hnsw_spark.queries.curation",
        "hnsw_spark.queries.retrieval",
        "hnsw_spark.queries.relational",
        "hnsw_spark.queries.index",
        "hnsw_spark.queries.multimodal",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass
