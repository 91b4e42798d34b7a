"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (exact cosine top-k over the
``embeddings`` fixture — the reference's core searchKNN/bruteForceKNN
semantics, /root/reference/src/main.ts:253-283 + src/bench/metrics.ts:9-24).
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles where ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hnsw_spark import registry  # noqa: E402

registry.load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hnsw_spark.queries.vector import knn_exact_cosine

    return knn_exact_cosine(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return dict(registry.ORACLES)
