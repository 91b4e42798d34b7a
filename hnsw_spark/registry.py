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
# prefix (the first 50), so order is evidence policy: queries whose newest
# driver row is stale or missing run FIRST, rows-only checks (the weakest
# evidence) run LAST, and everything with a fresh driver row rides behind.
#
# EVIDENCE-FRESHNESS BUDGET (adopted round 5, per VERDICT r4 #4): net-new
# registrations are capped at ~25 per round so the window can re-certify
# the whole registry within roughly two rounds of any addition.
#
# Round-9 rotation (tools/rotation_plan.py over the committed
# CORRECTNESS_r*.json after this round's registrations): the window leads
# with the 7 never-driver-sampled rows (this round's 6 net-new — the HNSW
# segment merge, the salted-build pair, the int8-store pair, the streaming
# trailing-features gate — plus jsonl_roundtrip, registered after r8's
# driver run), keeps the 5 r8-new rows for their SECOND sampling (VERDICT
# r8 #1), then re-certifies the stalest driver evidence: the r3 recall
# gates and the r4 block, oldest-first.  Rows-only checks (the 2 tuned-ANN
# tiers) stay last.  The r8 window's r2/r3-era rows all went green in
# CORRECTNESS_r08, so they rotate out.
_RUN_FIRST = (
    "trailing_features_stream_gate",
    "hnsw_merge_full_probe",
    "hnsw_salted_full_probe",
    "hnsw_salted_balance_gate",
    "hnsw_int8_full_probe",
    "ann_hnsw_int8_recall",
    "jsonl_roundtrip",
    "kmv_corpus_overlap",
    "kmv_stream_parity_gate",
    "target_encode_loo",
    "trailing_window_features",
    "bpe_merges",
    "ann_ivf_recall",
    "ann_hnsw_recall",
    "ann_ivfpq_recall",
    "multimodal_frame_sample",
    "random_projection",
    "knn_label_vote",
    "pca_gate",
    "latency_summary",
    "percentile_floor_global",
    "ab_compare",
    "ab_delta_summary",
    "percentile_sketch_gate",
    "dedup_incremental",
    "dedup_canonical",
    "boilerplate_spans",
    "semantic_dedup",
    "semantic_dedup_gate",
    "bigram_logprob",
    "html_strip",
    "zipf_stats",
    "pmi_cooccurrence",
    "heavy_hitters_gate",
    "bpe_encode_gate",
    "dataset_split",
    "contrastive_pairs",
    "chunk_pooled_embeddings",
    "curriculum_phases",
    "weighted_sample",
    "embedding_outliers",
    "apply_mixing",
    "global_shuffle",
    "pipeline_end_to_end",
    "chunk_documents",
    "crawl_pipeline_end_to_end",
    "pagerank_gate",
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "events_hourly_rollup",
)
_RUN_LAST = (
    "ann_ivf_knn",
    "ann_hnsw_knn",
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
    """Import every module that registers queries (idempotent).

    Import errors re-raise: every query module is mandatory, and a
    swallowed failure would silently shrink ``queries()`` — the driver
    would report the module's queries missing with nothing in-repo saying
    why (VERDICT r6 #2).  There are no optional-dependency modules here;
    if one ever appears, whitelist it explicitly rather than blanket-
    catching ImportError.
    """
    import hnsw_spark.queries.vector  # noqa: F401

    for mod in (
        "hnsw_spark.queries.evaluation",
        "hnsw_spark.queries.text",
        "hnsw_spark.queries.dedup",
        "hnsw_spark.queries.curation",
        "hnsw_spark.queries.pipeline",
        "hnsw_spark.queries.retrieval",
        "hnsw_spark.queries.relational",
        "hnsw_spark.queries.analytics",
        "hnsw_spark.queries.index",
        "hnsw_spark.queries.multimodal",
    ):
        __import__(mod)
    _apply_run_order()
