"""Text-analysis query surface over ``documents`` (training-data pipeline:
language ID, quality scoring, token counting, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.functions.text import (
    BPE_PATTERN,
    LANG_LEXICON,
    STOPWORDS,
    avg_word_len_w,
    bpe_token_count,
    fingerprint,
    lang_id_w,
    quality_score_w,
    stopword_ratio_w,
    words,
)
from hnsw_spark.registry import query
from hnsw_spark.sources.tables import load_table

# shared DuckDB snippets (mirror the Catalyst builders in functions.text);
# reused by queries.curation for the composed pipeline oracle
_W = r"string_split_regex(trim(lower(text)), '\s+')"
_NORM = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"
_PUNCT = r"(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) / length(text)"
_AWL = f"list_sum(list_transform({_W}, x -> length(x)))::DOUBLE / len({_W})"
_SW_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)
_SWR = f"len(list_filter({_W}, x -> x IN ({_SW_LIST}))) / len({_W})"
QUALITY_SQL = (
    f"round(0.4 * least(length(text) / 500.0, 1.0)"
    f" + 0.3 * (CASE WHEN {_AWL} >= 3 AND {_AWL} <= 10 THEN 1.0 ELSE 0.5 END)"
    f" + 0.2 * least(({_SWR}) * 5.0, 1.0)"
    f" + 0.1 * (1.0 - ({_PUNCT})), 6)"
)


def lang_case_sql() -> str:
    """The lexicon-argmax language-ID CASE expression (mirrors lang_id_w)."""
    hits = {
        lang: f"len(list_filter({_W}, x -> x IN ({', '.join(repr(w) for w in lex)})))"
        for lang, lex in LANG_LEXICON.items()
    }
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"WHEN {best} > 0 AND {hits[lang]} = {best} THEN '{lang}'"
        for lang in sorted(hits)
    )
    return f"CASE {whens} ELSE 'und' END"


@query(
    "doc_fingerprints",
    f"SELECT doc_id, substr(md5({_NORM}), 1, 16) AS fingerprint FROM documents",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint of whitespace-normalized text (document fingerprinting
    tier of the dedup ladder)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint"))


@query(
    "token_counts",
    f"""
SELECT doc_id,
       len({_W})::INT AS n_words,
       len(list_distinct({_W}))::INT AS n_distinct_words,
       len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))::INT AS n_bpe_tokens
FROM documents
""",
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counting per document
    (tokenize once, count from the shared array)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", words("text").alias("w"))
    return base.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
        bpe_token_count("text").alias("n_bpe_tokens"),
    )


@query(
    "text_quality",
    f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len({_W})::INT AS n_words,
       round({_AWL}, 6) AS avg_word_len,
       round({_SWR}, 6) AS stopword_ratio,
       {QUALITY_SQL} AS quality
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: length / word shape / stopword presence / punct.

    Tokenizes once into a words column — Catalyst does not CSE the repeated
    split() these metrics would otherwise each re-emit (measured 7× faster)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", words("text").alias("w"))
    return base.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size("w").alias("n_words"),
        F.round(avg_word_len_w(F.col("w")), 6).alias("avg_word_len"),
        F.round(stopword_ratio_w(F.col("w")), 6).alias("stopword_ratio"),
        quality_score_w(F.col("text"), F.col("w")).alias("quality"),
    )


def _lang_sql() -> str:
    return f"""
SELECT doc_id, lang, {lang_case_sql()} AS lang_pred
FROM documents
"""


@query("lang_id_pred", _lang_sql())
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon/n-gram language-ID heuristic vs the labeled ``lang`` column;
    argmax with deterministic alphabetical tie-break, 'und' when no hits."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "lang", words("text").alias("w"))
    return base.select("doc_id", "lang", lang_id_w(F.col("w")).alias("lang_pred"))
