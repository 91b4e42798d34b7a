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
# driver row is stale or red run FIRST, rows-only checks (the weakest
# evidence) run LAST, and the middle keeps the freshly-verified oracle block.
# Round-4 rotation: the 4 events-eval queries that ERRed in r3 on the loader
# dtype bug, the 17 oracle queries the r3 prefix never sampled (r2-only
# evidence), then any round-4 additions; the 46 r3-green queries ride behind.
# Late-round-4 additions (knn_hamming_rerank, mutual_knn_pairs,
# matryoshka_recall, mmr_diversified, events_in_windows,
# discounted_revenue_filters, event_anomaly_zscore, threshold_alert_episodes,
# token_budget_selection, lsh_quality_report, rowgroup_pruning_gate,
# market_share_by_year, sorted_export_gate, user_recency_scores,
# upsert_compaction, incremental_rollup, join_skew_report, quality_drift_ks,
# label_centroid_distances, hard_negatives, ann_binary_full_probe,
# ann_binary_recall, events_gapfilled_hourly, event_transition_matrix) land
# mid-pack — the window was already full of never-verified queries — and are
# FIRST in line for the round-5 window, together with the last-block
# additions dsir_selection, bloom_join_prune, time_weighted_avg,
# order_count_distribution, dormant_high_balance_customers,
# similarity_triangles, hll_cardinality, jaccard_prefix_filter, and
# count_min_frequencies, and data_expectations (all ten hold builder-side oracle-exact rows at
# BOTH sf0.01 and sf0.1 — see ORACLE_FULL_r04.json).
_RUN_FIRST = (
    # erred in r3 (events loader) — fixed, must re-earn green rows
    "latency_summary",
    "percentile_floor_global",
    "ab_compare",
    "ab_delta_summary",
    # same loader, outside the r3 sample window
    "events_hourly_rollup",
    "events_props_stats",
    "user_sessions",
    "asof_latest_view",
    # r2-only evidence: relational block + index/source stats
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "level_histogram",
    "index_build_stats",
    "synthetic_vectors",
    "fvecs_roundtrip",
    # upgraded rows-only → value oracle this round; need first hash rows
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_scene_cuts",
    # round-4 additions — no driver row exists yet
    "dedup_incremental",
    "apply_mixing",
    "global_shuffle",
    "pipeline_end_to_end",
    "table_profile",
    "table_profile_approx_gate",
    "dataset_split",
    "bigram_logprob",
    "random_projection",
    "contrastive_pairs",
    "chunk_documents",
    "percentile_sketch_gate",
    "html_strip",
    "crawl_pipeline_end_to_end",
    "chunk_pooled_embeddings",
    "dedup_canonical",
    "boilerplate_spans",
    "knn_label_vote",
    "zipf_stats",
    "pmi_cooccurrence",
    "event_funnel",
    "heavy_hitters_gate",
    "semantic_dedup",
    "semantic_dedup_gate",
    "pca_gate",
    "curriculum_phases",
    "weighted_sample",
    "bpe_encode_gate",
    "trade_volume_nation_pairs",
    "order_priority_checking",
    "index_merge_full_probe",
    "embedding_outliers",
    "pagerank_gate",
    # below the driver's 50-row window this round: r2-green plain-SQL
    # relational queries, unchanged since r2 — next in line for rotation
    "top_customers_per_segment",
    "customers_without_orders",
    "revenue_rollup",
    "order_priority_rolling",
    "promo_revenue_by_type",
    "top_suppliers_per_nation",
    "returns_cube",
)
_RUN_LAST = (
    "ann_ivf_knn",
    "ann_hnsw_knn",
    "bpe_merges",
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
