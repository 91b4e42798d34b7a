"""Curation query surface over ``documents``: the composed keep/drop
pipeline, deterministic stratified sampling, and vocabulary statistics —
each with a DuckDB oracle built from the same SQL fragments as the
text-analysis oracles, so every rule fires identically in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hnsw_spark.operators.curation import (
    curation_flags,
    stratified_sample,
    tfidf_top_terms,
    vocab_stats,
)
from hnsw_spark.queries.text import _NORM, _W, QUALITY_SQL, lang_case_sql
from hnsw_spark.registry import query
from hnsw_spark.sources.tables import load_table

_CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         substr(md5({_NORM}), 1, 16) AS fp,
         len({_W})::INT AS n_words,
         {QUALITY_SQL} AS quality,
         {lang_case_sql()} AS lang_pred
  FROM documents
),
canon AS (
  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical FROM scored
)
SELECT doc_id, n_words, quality, lang_pred,
       CASE WHEN doc_id != canonical THEN 'duplicate'
            WHEN n_words < 5 THEN 'too_short'
            WHEN quality < 0.5 THEN 'low_quality'
            WHEN lang_pred = 'und' THEN 'lang'
            ELSE NULL END AS drop_reason,
       (CASE WHEN doc_id != canonical THEN 'duplicate'
             WHEN n_words < 5 THEN 'too_short'
             WHEN quality < 0.5 THEN 'low_quality'
             WHEN lang_pred = 'und' THEN 'lang'
             ELSE NULL END) IS NULL AS keep
FROM canon
"""


@query("curation_filter", _CURATION_SQL)
def curation_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation decision: canonical-copy election
    over the exact-dedup fingerprint, then length, quality, and language
    gates, with a priority-ordered drop_reason per document.  One shuffle
    total (the fingerprint window); all gates are per-row Catalyst
    expressions inside one codegen span."""
    return curation_flags(load_table(spark, sf_dir, "documents"))


_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'v1'), 1, 8))::BIGINT
        / 4294967296.0
      < (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3 ELSE 0.1 END)
"""


@query("stratified_sample", _SAMPLE_SQL)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (en 50%, es 30%, rest 10%):
    the keep decision is a pure md5 hash of the doc id, so it is shuffle-free,
    pushes to the scan, and reproduces row-for-row across engines — which is
    exactly what this oracle asserts."""
    docs = load_table(spark, sf_dir, "documents")
    res = stratified_sample(
        docs, "lang", {"en": 0.5, "es": 0.3}, default_fraction=0.1, salt="v1"
    )
    return res.select("doc_id", "lang")


_VOCAB_SQL = f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({_W}) AS token FROM documents
)
SELECT token, count(*)::BIGINT AS tf, count(DISTINCT id)::BIGINT AS df
FROM tok WHERE token != ''
GROUP BY token
ORDER BY tf DESC, token
LIMIT 100
"""


_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({_W}) AS token FROM documents
),
tok2 AS (SELECT * FROM tok WHERE token != ''),
tf AS (SELECT id, token, count(*)::BIGINT AS tf FROM tok2 GROUP BY id, token),
dfreq AS (SELECT token, count(DISTINCT id)::BIGINT AS df FROM tok2 GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
weighted AS (
  SELECT tf.id, tf.token, tf.tf, dfreq.df,
         round(tf.tf * (ln((n.n_docs + 1)::DOUBLE / (dfreq.df + 1)) + 1.0), 6) AS weight
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY id ORDER BY weight DESC, token) AS rank
  FROM weighted
)
SELECT id, rank::INT AS rank, token, tf, df, weight
FROM ranked WHERE rank <= 5
"""


@query("tfidf_top_terms", _TFIDF_SQL)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document with smoothed idf and a deterministic
    (weight desc, token) tie-break — the retrieval-style text scoring layer
    over the vocab statistics."""
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=5)


@query("vocab_stats", _VOCAB_SQL)
def vocab_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary by term frequency with document frequency,
    (tf desc, token) total order so the truncation boundary is deterministic.
    Explode → one token shuffle with map-side partials → TakeOrdered."""
    return vocab_stats(load_table(spark, sf_dir, "documents"), top_n=100)
