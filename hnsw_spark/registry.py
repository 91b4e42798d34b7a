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
# Round-10 rotation (tools/rotation_plan.py over the committed
# CORRECTNESS_r*.json after this round's registrations): the window leads
# with the 8 never-driver-sampled rows (this round's net-new — the Jaccard
# crossover dispatch gate, the streaming target-encoder gate, and the six
# grown-graph full probes closing the insert/merge × store/salt operation
# matrix: int8 merge, int8 insert, salted insert, salted×int8 composition,
# salted merge, salted×int8 insert), keeps the 6 r9-new rows for their SECOND
# sampling (VERDICT r9 #1), then re-certifies the stalest driver evidence:
# the remaining r4 block (events_props_stats onward — the r9 window
# cleared the r3 rows and the head of r4), then r6-era rows oldest-first
# to fill.  Rows-only checks (the 2 tuned-ANN tiers) stay last.
_RUN_FIRST = (
    "jaccard_auto_dispatch",
    "target_encode_stream_gate",
    "hnsw_int8_merge_full_probe",
    "hnsw_int8_insert_full_probe",
    "hnsw_salted_insert_full_probe",
    "hnsw_salted_int8_full_probe",
    "hnsw_salted_merge_full_probe",
    "hnsw_salted_int8_insert_full_probe",
    "trailing_features_stream_gate",
    "hnsw_merge_full_probe",
    "hnsw_salted_full_probe",
    "hnsw_salted_balance_gate",
    "hnsw_int8_full_probe",
    "ann_hnsw_int8_recall",
    "events_props_stats",
    "user_sessions",
    "asof_latest_view",
    "table_profile",
    "table_profile_approx_gate",
    "event_funnel",
    "trade_volume_nation_pairs",
    "order_priority_checking",
    "level_histogram",
    "index_build_stats",
    "synthetic_vectors",
    "fvecs_roundtrip",
    "index_merge_full_probe",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_scene_cuts",
    "knn_hamming_rerank",
    "mutual_knn_pairs",
    "matryoshka_recall",
    "label_centroid_distances",
    "hard_negatives",
    "classifier_eval_kappa",
    "lsh_quality_report",
    "similarity_triangles",
    "jaccard_prefix_filter",
    "kcore_gate",
    "containment_pairs",
    "count_min_frequencies",
    "tfidf_doc_similarity",
    "token_budget_selection",
    "quality_drift_ks",
    "quality_auc",
    "cross_split_contamination_gate",
    "sorted_export_gate",
    "upsert_compaction",
    "dsir_selection",
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
