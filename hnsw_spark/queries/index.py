"""Index-construction query surface: level sampling (B1), index stats,
seeded synthetic generation (S5), and the approximate IVF tier (Q1-Q3).

The IVF query is genuinely non-SQL-expressible (iterative k-means), so it is
registered without an oracle (rows-only check); its correctness harness is
recall-vs-exact in tests/test_ann.py — the reference's own validation regime
(bench/README.md:108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.functions.similarity import l2_norm
from hnsw_spark.operators.ann import build_ivf_index
from hnsw_spark.operators.levels import (
    index_stats,
    level_histogram,
    select_level_sql,
)
from hnsw_spark.registry import query
from hnsw_spark.sources.synthetic import synthetic_uniform_sql, synthetic_vectors
from hnsw_spark.sources.tables import load_table

M, SEED = 16, 42
_LVL = select_level_sql("vec_id", M, SEED)


@query(
    "level_histogram",
    f"""
SELECT level, count(*)::BIGINT AS n
FROM (SELECT {_LVL} AS level FROM embeddings)
GROUP BY level
""",
)
def level_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: geometric level distribution over the corpus (M=16), hash-seeded
    so the draw is partition-invariant and oracle-checkable."""
    return level_histogram(load_table(spark, sf_dir, "embeddings"), m=M, seed=SEED)


@query(
    "index_build_stats",
    f"""
WITH lv AS (SELECT vec_id, {_LVL} AS level FROM embeddings)
SELECT (SELECT count(*) FROM lv)::BIGINT AS n_nodes,
       (SELECT max(level) FROM lv)::INT AS level_max,
       (SELECT min(vec_id) FROM lv
        WHERE level = (SELECT max(level) FROM lv)) AS entry_point_id
""",
)
def index_build_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index scalar state: node count, max level, entry point = first
    (lowest-id) node at the max level (promotion rule src/main.ts:225-228)."""
    return index_stats(load_table(spark, sf_dir, "embeddings"), m=M, seed=SEED)


_SYN_N, _SYN_D = 500, 16


@query(
    "synthetic_vectors",
    f"""
SELECT vec_id,
       len(embedding)::INT AS dim,
       round(embedding[1]::DOUBLE, 6) AS x0,
       round(embedding[2]::DOUBLE, 6) AS x1,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
FROM ({synthetic_uniform_sql(_SYN_N, _SYN_D, SEED)})
""",
)
def synthetic_vectors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: seeded uniform [−1,1) synthetic vectors — deterministic per
    (seed, id, coordinate) under any partitioning; fully oracle-checked."""
    df = synthetic_vectors(spark, _SYN_N, _SYN_D, seed=SEED)
    return df.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("x0"),
        F.round(F.element_at("embedding", 2).cast("double"), 6).alias("x1"),
        F.round(l2_norm("embedding"), 6).alias("norm"),
    )


@query("ann_ivf_knn")  # no oracle: iterative k-means is not SQL-expressible
def ann_ivf_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q3 approximate tier: IVF-partitioned top-k (n_lists=8, n_probe=2)
    for the standard 8-query batch; recall-vs-exact asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    index = build_ivf_index(emb, n_lists=8, metric="cosine")
    res = index.search(qs, k=10, n_probe=2)
    return res.select("query_id", "id", F.round("score", 6).alias("score"))


from hnsw_spark.sources.synthetic import synthetic_documents_sql

_DOC_N, _DOC_W = 500, 20


@query(
    "synthetic_documents",
    f"""
SELECT doc_id, substr(md5(text), 1, 16) AS fp, len(string_split(text, ' ')) AS n_words
FROM ({synthetic_documents_sql(_DOC_N, _DOC_W, seed=SEED)})
""",
)
def synthetic_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded synthetic document corpus (hash-derived words, planted exact
    duplicates) — byte-identical across engines, fully oracle-checked."""
    from hnsw_spark.sources.synthetic import synthetic_documents

    docs = synthetic_documents(spark, _DOC_N, _DOC_W, seed=SEED)
    return docs.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp"),
        F.size(F.split("text", " ")).alias("n_words"),
    )


from hnsw_spark.queries.vector import _COSINE_EXPR, _KNN_ORACLE


@query(
    "ann_ivf_full_probe",
    _KNN_ORACLE.format(nq=8, k=10, score_expr=_COSINE_EXPR),
)
def ann_ivf_full_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with n_probe = n_lists degenerates to exact search, so the WHOLE
    approximate-tier pipeline — assignment completeness (every vector in
    exactly one list), Catalyst scoring, broadcast probe join, global top-k
    merge — is checkable against the exact-kNN SQL oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    index = build_ivf_index(emb, n_lists=8, metric="cosine")
    res = index.search(qs, k=10, n_probe=8)
    return res.select("query_id", "id", F.round("score", 6).alias("score"))


@query(
    "ann_hnsw_full_probe",
    _KNN_ORACLE.format(nq=8, k=10, score_expr=_COSINE_EXPR),
)
def ann_hnsw_full_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HNSW tier's exact degeneration (the reference's own pinned-level
    test discipline, tests/HNSW.test.ts): levels pinned to 0, every list
    probed, ef ≥ list size ⇒ each per-list beam exhausts its (connected)
    layer-0 graph and the global merge equals exact kNN — so graph build,
    wiring, beam search, entry-point persistence, and the top-k merge are
    all checked against the exact-kNN SQL oracle."""
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    index = build_hnsw_index(
        emb, n_lists=8, m=8, ef_construction=48, metric="cosine", max_level=0
    )
    res = index.search(qs, k=10, n_probe=8, ef_search=1 << 20)
    return res.select("query_id", "id", F.round("score", 6).alias("score"))


@query("ann_hnsw_knn")  # no oracle: order-dependent graph build (SURVEY §7)
def ann_hnsw_knn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-B7 + Q1-Q3: partition-local HNSW graphs over IVF lists, greedy
    descent + ef-bounded beam per probed list, global top-k merge.
    Recall-vs-exact asserted in tests (the reference's validation regime)."""
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8)
    index = build_hnsw_index(emb, n_lists=8, m=8, ef_construction=48, metric="cosine")
    res = index.search(qs, k=10, n_probe=4, ef_search=48)
    return res.select("query_id", "id", F.round("score", 6).alias("score"))
