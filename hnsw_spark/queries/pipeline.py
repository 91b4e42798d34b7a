"""Pipeline write-side query surface over ``documents``: benchmark
decontamination, sequence packing, deterministic sharding, PII scrubbing,
and domain mixing weights — the operations between a curated corpus and a
training run, each with a DuckDB oracle built from the same seeded
parameters and the shared tokenizer fragments."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.functions.pii import PII_PATTERNS, pii_counts, redact_pii
from hnsw_spark.functions.text import BPE_PATTERN
from hnsw_spark.operators.contamination import contamination_flags
from hnsw_spark.operators.curation import _unit_hash, mixing_weights
from hnsw_spark.operators.packing import assign_shards, pack_sequences
from hnsw_spark.queries.dedup import _shingle_sql
from hnsw_spark.queries.text import _W
from hnsw_spark.operators.evaluation import dquant
from hnsw_spark.registry import query
from hnsw_spark.sources.tables import load_table

# deterministic "benchmark" subset: ~5% of documents by pure id hash — the
# oracle and the Spark side derive the same member set, and members overlap
# themselves 100%, so the flagged set is non-trivial by construction
_BENCH_FRAC = 0.05
_BENCH_SALT = "bench"
_CONTAM_N = 3
_CONTAM_THRESHOLD = 0.5

_HASH_01 = (
    "('0x' || substr(md5(doc_id::VARCHAR || '{salt}'), 1, 8))::BIGINT"
    " / 4294967296.0"
)

_CONTAM_SQL = f"""
WITH docs AS (SELECT doc_id, {_W} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id, unnest({_shingle_sql(_CONTAM_N)}) AS shingle FROM docs)
),
bench AS (
  SELECT DISTINCT shingle FROM sh
  WHERE id IN (SELECT doc_id FROM documents
               WHERE {_HASH_01.format(salt=_BENCH_SALT)} < {_BENCH_FRAC})
),
per_doc AS (
  SELECT sh.id, count(*)::BIGINT AS n_shingles,
         count(b.shingle)::BIGINT AS n_matched
  FROM sh LEFT JOIN bench b ON sh.shingle = b.shingle
  GROUP BY sh.id
)
SELECT d.doc_id,
       coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(p.n_matched, 0)::BIGINT AS n_matched,
       CAST(floor(coalesce(p.n_matched / p.n_shingles, 0.0) * 1e6 + 0.5)
            AS BIGINT) AS overlap_fp,
       coalesce(p.n_matched / p.n_shingles, 0.0)
         >= {_CONTAM_THRESHOLD} AS contaminated
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
"""


@query("decontamination", _CONTAM_SQL)
def decontamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each document's distinct word
    3-grams that appear in a (seeded 5%) benchmark subset; docs at ≥ 50%
    overlap are flagged.  The benchmark n-gram set broadcasts (eval sets are
    MBs vs a TB corpus), so the probe is scan-side; one per-doc shuffle
    (operators/contamination.py)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(
        _unit_hash(F.col("doc_id"), _BENCH_SALT) < _BENCH_FRAC
    )
    res = contamination_flags(
        docs, bench, n=_CONTAM_N, threshold=_CONTAM_THRESHOLD
    )
    return res.select(
        "doc_id", "n_shingles", "n_matched",
        dquant("overlap", 6).alias("overlap_fp"),
        "contaminated",
    )


_PACK_BUDGET = 512
_PACK_SHARDS = 16

_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || 'pack'), 1, 8))::BIGINT
           % {_PACK_SHARDS} AS shard_id,
         len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))::BIGINT
           AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         sum(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM t
)
SELECT doc_id, shard_id, n_tokens,
       floor(s / {_PACK_BUDGET})::BIGINT AS bin_id,
       (s % {_PACK_BUDGET})::BIGINT AS offset_in_bin,
       (s % {_PACK_BUDGET}) + n_tokens > {_PACK_BUDGET} AS overflows
FROM c
"""


@query("sequence_packing", _PACK_SQL)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing into 512-token training bins
    within 16 deterministic shards: each document lands in the bin holding
    its start offset; ``overflows`` marks boundary-straddlers.  One
    shard-partitioned window cumsum — num_shards-way parallel, no global
    sort (operators/packing.py)."""
    return pack_sequences(
        load_table(spark, sf_dir, "documents"),
        budget=_PACK_BUDGET,
        num_shards=_PACK_SHARDS,
    )


_SHARD_N = 8

_SHARD_SQL = f"""
SELECT shard_id, count(*)::BIGINT AS n_docs,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
       sum(n_chars)::BIGINT AS shard_chars
FROM (
  SELECT doc_id, n_chars,
         ('0x' || substr(md5(doc_id::VARCHAR || 'shard'), 1, 8))::BIGINT
           % {_SHARD_N} AS shard_id
  FROM documents)
GROUP BY shard_id
"""


@query("shard_assignment", _SHARD_SQL)
def shard_assignment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sharding audit: per-shard row/byte counts under
    the engine-portable md5 shard function (operators/packing.py) — the
    balance check a shard-writing job publishes.  Shard assignment is a
    scan-stage expression; the audit is one width-8 aggregate."""
    docs = assign_shards(
        load_table(spark, sf_dir, "documents"), _SHARD_N
    )
    return docs.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum("n_chars").alias("shard_chars"),
    )


# documents carry no real PII, so the query plants a deterministic PII
# suffix derived from doc_id, then proves the scrubber removes it — the
# redacted text is pinned by md5, so a single missed character flips the row
def _pii_suffix_spark() -> tuple[F.Column, ...]:
    return (
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789 call 555-867-5309"),
    )
_PII_SUFFIX_SQL = (
    "' contact user' || doc_id::VARCHAR || '@example.com ip 10.0.'"
    " || (doc_id % 256)::VARCHAR || '.7 ssn 123-45-6789 call 555-867-5309'"
)


def _redact_sql(expr: str) -> str:
    for kind, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<PII:{kind}>', 'g')"
    return expr


_PII_SQL = f"""
WITH t AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text FROM documents),
r AS (
  SELECT doc_id, text, {_redact_sql("text")} AS redacted FROM t
)
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_PATTERNS["email"]}'))::INT AS n_email,
       len(regexp_extract_all(text, '{PII_PATTERNS["ipv4"]}'))::INT AS n_ipv4,
       len(regexp_extract_all(text, '{PII_PATTERNS["ssn"]}'))::INT AS n_ssn,
       len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}'))::INT AS n_phone,
       length(redacted)::BIGINT AS redacted_len,
       substr(md5(redacted), 1, 16) AS redacted_fp
FROM r
"""


@query("pii_scrub", _PII_SQL)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (emails, IPv4, SSN-shaped, phone-shaped) over
    documents with a planted deterministic PII suffix: per-kind match
    counts plus the md5 fingerprint of the redacted text, so the exact
    redaction output is value-hash-checked.  All kernels are Catalyst
    regexp expressions fused into the scan stage (functions/pii.py)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.concat(F.col("text"), *_pii_suffix_spark()).alias("text")
    )
    counts = pii_counts("text")
    red = redact_pii("text")
    return t.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["ssn"].alias("n_ssn"),
        counts["phone"].alias("n_phone"),
        F.length(red).alias("redacted_len"),
        F.substring(F.md5(red), 1, 16).alias("redacted_fp"),
    )


def _quality_logit_sql() -> str:
    from hnsw_spark.queries.text import _AWL, _SWR, _W

    z = (
        f"-1.2 + 1.5 * least(len({_W})::DOUBLE / 200.0, 1.0)"
        f" + 2.0 * ({_SWR})"
        f" + 0.8 * (CASE WHEN {_AWL} >= 3 AND {_AWL} <= 10 THEN 1.0 ELSE 0.0 END)"
        f" - 3.0 * (CASE WHEN length(text) = 0 THEN 0.0"
        f" ELSE (length(text) - length(regexp_replace(text,"
        f" '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / length(text) END)"
    )
    return f"""
WITH s AS (SELECT doc_id, ({z}) AS z FROM documents)
SELECT doc_id,
       CAST(floor(z * 1e6 + 0.5) AS BIGINT) AS z_fp,
       CAST(floor((0.5 + 0.5 * z / (1 + abs(z))) * 1e6 + 0.5) AS BIGINT)
         AS prob_fp,
       (0.5 + 0.5 * z / (1 + abs(z))) >= 0.5 AS keep_pred
FROM s
"""


@query("quality_classifier", _quality_logit_sql())
def quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier over exact-rational text
    features with a rational sigmoid link — every row pinned by the oracle
    (operators/curation.py:quality_classifier)."""
    from hnsw_spark.operators.curation import quality_classifier

    res = quality_classifier(load_table(spark, sf_dir, "documents"))
    return res.select(
        "doc_id",
        dquant("z", 6).alias("z_fp"),
        dquant("prob", 6).alias("prob_fp"),
        "keep_pred",
    )


_MIX_ALPHA = 0.5
_MIX_TARGET = 1000

_MIX_SQL = f"""
WITH c AS (
  SELECT source AS domain, count(*)::BIGINT AS n_docs
  FROM documents GROUP BY source
),
t AS (SELECT sum(pow(n_docs, {_MIX_ALPHA})) AS pt, sum(n_docs) AS nt FROM c)
SELECT domain, n_docs,
       CAST(floor(n_docs / nt * 1e6 + 0.5) AS BIGINT) AS natural_share_fp,
       CAST(floor(pow(n_docs, {_MIX_ALPHA}) / pt * 1e6 + 0.5) AS BIGINT)
         AS weight_fp,
       CAST(floor(pow(n_docs, {_MIX_ALPHA}) / pt * {_MIX_TARGET} / n_docs
            * 1e6 + 0.5) AS BIGINT) AS sample_rate_fp
FROM c, t
"""


@query("mixing_weights", _MIX_SQL)
def mixing_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) domain mixing weights over ``source``
    with the per-domain sampling rate realizing a 1000-row target mix —
    rates above 1.0 signal required up-sampling.  One corpus aggregate;
    normalization totals ride as a broadcast 1-row aggregate
    (operators/curation.py:mixing_weights)."""
    res = mixing_weights(
        load_table(spark, sf_dir, "documents"),
        by="source",
        alpha=_MIX_ALPHA,
        target_rows=_MIX_TARGET,
    )
    return res.select(
        "domain", "n_docs",
        dquant("natural_share", 6).alias("natural_share_fp"),
        dquant("weight", 6).alias("weight_fp"),
        dquant("sample_rate", 6).alias("sample_rate_fp"),
    )


_AM_RATES = {"src0": 2.5, "src1": 0.3, "src2": 0.0}
_AM_SALT = "mix"

_APPLY_MIX_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         (CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.3
                      WHEN 'src2' THEN 0.0 ELSE 1.0 END) AS rate,
         {_HASH_01.format(salt=_AM_SALT)} AS u
  FROM documents
), n AS (
  SELECT doc_id, source,
         (floor(rate) + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END)::BIGINT
           AS n
  FROM r
)
SELECT doc_id, source, unnest(generate_series(1, n)) AS copy
FROM n WHERE n >= 1
"""


@query("apply_mixing", _APPLY_MIX_SQL)
def apply_mixing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a domain mixture over ``documents``: src0 upsampled to
    2.5 expected epochs, src1 downsampled to 0.3, src2 dropped, everything
    else passed through — deterministic hash-driven copies, shuffle-free
    (operators/curation.py:apply_mixing).  The oracle reproduces the exact
    (doc, copy) multiset."""
    from hnsw_spark.operators.curation import apply_mixing

    docs = load_table(spark, sf_dir, "documents")
    return apply_mixing(docs, _AM_RATES, by="source", salt=_AM_SALT).select(
        "doc_id", "source", "copy"
    )


_GS_SALT, _GS_BUCKETS = "shuffle", 1024

_GLOBAL_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT doc_id,
         md5(doc_id::VARCHAR || '{_GS_SALT}') AS key,
         ('0x' || substr(md5(doc_id::VARCHAR || '{_GS_SALT}'), 1, 8))::BIGINT
           % {_GS_BUCKETS} AS bucket
  FROM documents)
SELECT doc_id,
       (row_number() OVER (ORDER BY bucket, key, doc_id) - 1)::BIGINT AS pos
FROM k
"""


@query("global_shuffle", _GLOBAL_SHUFFLE_SQL)
def global_shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-wide training order: unique 0-based ``pos``
    from the (bucket, md5, id) total order, computed two-level (bucketed
    row_number + broadcast offsets) so no global sort exists in the plan
    (operators/packing.py:global_shuffle).  The oracle replays the same
    total order as one window."""
    from hnsw_spark.operators.packing import global_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return global_shuffle(docs, n_buckets=_GS_BUCKETS, salt=_GS_SALT).select(
        "doc_id", "pos"
    )


# ---- flagship composition: the whole write-side pipeline in ONE plan ----
# curate (canonical-copy election + length/quality/lang gates) → PII scrub →
# tokenize → deterministic shard → greedy pack → per-shard training manifest.
# This is the query a user of the engine actually ships: every stage is an
# operator verified on its own elsewhere in the registry; here the oracle
# checks their COMPOSITION end-to-end (the joins/windows between stages are
# where silent row drift would hide).

def _e2e_sql() -> str:
    from hnsw_spark.queries.text import _NORM, _W, QUALITY_SQL, lang_case_sql

    return f"""
WITH scored AS (
  SELECT doc_id, text,
         substr(md5({_NORM}), 1, 16) AS fp,
         len({_W})::INT AS n_words,
         {QUALITY_SQL} AS quality,
         {lang_case_sql()} AS lang_pred
  FROM documents
),
kept AS (
  SELECT doc_id, text FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical FROM scored)
  WHERE doc_id = canonical AND n_words >= 5 AND quality >= 0.5
        AND lang_pred != 'und'
),
scrub AS (SELECT doc_id, {_redact_sql("text")} AS text FROM kept),
t AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || 'pack'), 1, 8))::BIGINT
           % {_PACK_SHARDS} AS shard_id,
         len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))::BIGINT
           AS n_tokens
  FROM scrub
),
c AS (
  SELECT *,
         sum(n_tokens) OVER (
           PARTITION BY shard_id ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) - n_tokens AS s
  FROM t
),
p AS (
  SELECT shard_id, n_tokens,
         floor(s / {_PACK_BUDGET})::BIGINT AS bin_id,
         ((s % {_PACK_BUDGET}) + n_tokens > {_PACK_BUDGET})::INT AS ovf
  FROM c
)
SELECT shard_id, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS shard_tokens,
       (max(bin_id) + 1)::BIGINT AS n_bins,
       sum(ovf)::BIGINT AS n_overflows
FROM p GROUP BY shard_id
"""


@query("pipeline_end_to_end", _e2e_sql())
def pipeline_end_to_end_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full write-side pipeline as one Catalyst plan: curation gates
    (canonical-copy election, length/quality/language), PII redaction,
    BPE-ish tokenization, deterministic hash-sharding, greedy bin packing,
    and the per-shard training manifest (docs, tokens, bins, overflows)
    a data loader consumes.  Composition shape: one documents scan feeds
    the fingerprint window; the kept set flows through scan-stage scrub +
    token/shard expressions into the shard-partitioned packing window —
    two keyed shuffles total (fingerprint, shard) before the final
    width-{_PACK_SHARDS} aggregate; no stage materializes an intermediate
    corpus."""
    from hnsw_spark.operators.curation import curation_flags

    docs = load_table(spark, sf_dir, "documents")
    # carry text through the flags' fingerprint window instead of joining
    # the kept ids back to the corpus: the join-back form scanned the
    # documents a second time and paid two id-keyed join shuffles on top
    # of the window's (text rides the one exchange the election already
    # owns; same rows, same values)
    flags = curation_flags(docs, carry_cols=("text",))
    kept = flags.filter(F.col("keep")).select(
        "doc_id", redact_pii("text").alias("text")
    )
    packed = pack_sequences(kept, budget=_PACK_BUDGET, num_shards=_PACK_SHARDS)
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        (F.max("bin_id") + 1).alias("n_bins"),
        F.sum(F.col("overflows").cast("int")).alias("n_overflows"),
    )


_CHUNK_SIZE, _CHUNK_OVERLAP = 128, 32
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP

_CHUNK_SQL = f"""
WITH b AS (SELECT doc_id, {_W} AS w, len({_W})::BIGINT AS n FROM documents),
e AS (
  SELECT doc_id, w,
         s.s AS chunk_start,
         (s.s / {_CHUNK_STRIDE})::INT AS chunk_id
  FROM b,
       unnest(generate_series(
         0,
         greatest(floor((n - 1) / {_CHUNK_STRIDE})::BIGINT * {_CHUNK_STRIDE},
                  0),
         {_CHUNK_STRIDE})) AS s(s)
)
SELECT doc_id, chunk_id, chunk_start,
       len(w[chunk_start + 1 : chunk_start + {_CHUNK_SIZE}])::INT
         AS n_chunk_tokens,
       array_to_string(w[chunk_start + 1 : chunk_start + {_CHUNK_SIZE}], ' ')
         AS chunk_text
FROM e
"""


@query("chunk_documents", _CHUNK_SQL)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (128-token chunks, 32 overlap):
    the long-document preparation step for context windows / RAG passages.
    Scan-stage sequence+slice expansion, zero shuffles; the oracle rebuilds
    every chunk's exact text (operators/packing.py:chunk_documents)."""
    from hnsw_spark.operators.packing import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP
    )


# ---- read-side composition flagship: crawl → curated corpus in ONE plan ----
def _crawl_e2e_sql() -> str:
    from hnsw_spark.queries.text import (
        _HTML_PREFIX_SQL,
        _HTML_SUFFIX_SQL,
        _NORM,
        _W,
        QUALITY_SQL,
        _strip_sql,
        lang_case_sql,
    )

    return f"""
WITH raw AS (
  SELECT doc_id, {_HTML_PREFIX_SQL} || text || {_HTML_SUFFIX_SQL} AS raw
  FROM documents
),
cleaned AS (SELECT doc_id, {_strip_sql("raw")} AS text FROM raw),
scored AS (
  SELECT doc_id, text,
         substr(md5({_NORM}), 1, 16) AS fp,
         len({_W})::INT AS n_words,
         {QUALITY_SQL} AS quality,
         {lang_case_sql()} AS lang_pred
  FROM cleaned
),
kept AS (
  SELECT doc_id, text FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical FROM scored)
  WHERE doc_id = canonical AND n_words >= 5 AND quality >= 0.5
        AND lang_pred != 'und'
),
sp AS (
  SELECT doc_id, text,
         CASE WHEN u < 0.1 THEN 'test'
              WHEN u < 0.9 THEN 'train'
              ELSE 'val' END AS split
  FROM (
    SELECT doc_id, text,
           ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
             / 4294967296.0 AS u
    FROM kept)
)
SELECT split, count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(lower(text), '{BPE_PATTERN}')))::BIGINT
         AS total_tokens
FROM sp GROUP BY split
"""


@query("crawl_pipeline_end_to_end", _crawl_e2e_sql())
def crawl_pipeline_end_to_end_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side composed end-to-end, the mirror of
    pipeline_end_to_end's write side: planted raw HTML → markup stripping →
    curation gates (canonical-copy election on the CLEAN text, length /
    quality / language) → append-stable train/val/test split → per-split
    doc and token totals.  One documents scan feeds the whole plan; the
    only shuffles are the fingerprint window and the final 3-row
    aggregate.  The oracle replays every stage, so cross-stage row drift
    (the failure mode compositions hide) is hash-checked."""
    from hnsw_spark.functions.html import strip_html
    from hnsw_spark.functions.text import bpe_token_count
    from hnsw_spark.operators.curation import curation_flags, dataset_split
    from hnsw_spark.queries.text import html_shell_expr

    docs = load_table(spark, sf_dir, "documents")
    cleaned = docs.select(
        "doc_id", html_shell_expr().alias("raw")
    ).select("doc_id", strip_html("raw").alias("text"))
    # carry the stripped text through the flags' fingerprint window: the
    # join-back form re-ran the whole HTML-synthesis + strip_html regexp
    # pipeline a second time for the join's left side (Spark does not CSE
    # shared subtrees) and paid two join shuffles on top of the window's
    flags = curation_flags(cleaned, carry_cols=("text",))
    kept = flags.filter(F.col("keep")).select("doc_id", "text")
    sp = dataset_split(kept, {"train": 0.8, "val": 0.1, "test": 0.1})
    return sp.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe_token_count("text")).alias("total_tokens"),
    )


@query(
    "pagerank_gate",
    """
SELECT true AS mass_ok, true AS all_positive, true AS contracting,
       true AS stable_top
""",
)
def pagerank_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph authority scoring (operators/pagerank.py): build the
    k-NN similarity digraph over the embeddings (each vector links to its
    5 nearest cosine neighbors — the similarity-graph stand-in for a crawl
    link graph), run 8 dangling-aware power iterations plus two probe
    steps warm-started off the chain, and assert the invariants that pin
    the implementation: probability mass conserved (|Σr − 1| < 1e-9),
    strict positivity, and the theoretical L1 contraction — each power
    step must shrink the update by at least the damping factor
    (‖r₁₀−r₉‖₁ ≤ 0.85·‖r₉−r₈‖₁), which holds for a correct
    dangling-aware transition matrix and fails for mass-leaking ones —
    plus a stable argmax across the probe.  Exact per-rank parity with a
    sequential reference is pinned in tests/test_pagerank.py; the
    booleans are driver-comparable against the trivial oracle."""
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.operators.pagerank import pagerank

    emb = load_table(spark, sf_dir, "embeddings")
    # local_merge (BLAS block scoring + per-partition top-k), not the
    # window tier: every corpus row is a query here, and the window path's
    # Catalyst crossJoin scored Q×N cells through interpreted array lambdas
    # plus a Q×N-row window shuffle — measured 8-20 s of the gate's 11-15 s
    # wall at sf0.1 (the same all-rows-are-queries shape mutual_knn_pairs
    # already routes through local_merge).  At a 100 TB corpus the kNN
    # graph would come from the ANN tier; this gate measures PAGERANK.
    nn = knn_exact(
        emb, emb, k=6, metric="cosine", strategy="local_merge"
    ).filter(F.col("query_id") != F.col("id"))
    edges = nn.select(
        F.col("query_id").alias("src"), F.col("id").alias("dst")
    ).localCheckpoint()  # consumed by pagerank's node/degree/dangling setup
    # ONE chain with snapshots (VERDICT r13 #4): the former
    # r0 = pagerank(8); r1 = pagerank(1, init=r0); r2 = pagerank(1, init=r1)
    # shape re-ran the whole graph setup (node distinct + count, degree
    # weights, dangling check) per call — 3× — and each returned frame was
    # checkpointed twice.  Identical per-step arithmetic, already
    # checkpointed at each snapshot.
    r0, r1, r2 = pagerank(edges, snapshots=(8, 9, 10))
    joined = (
        r0.withColumnRenamed("rank", "r0")
        .join(r1.withColumnRenamed("rank", "r1"), "id")
        .join(r2.withColumnRenamed("rank", "r2"), "id")
    )
    top1 = r1.orderBy(F.desc("rank"), "id").limit(1)
    top2 = r2.orderBy(F.desc("rank"), "id").limit(1)
    tops = top1.select(F.col("id").alias("ta")).crossJoin(
        top2.select(F.col("id").alias("tb"))
    )
    return (
        r2.agg(
            (F.abs(F.sum("rank") - 1.0) < 1e-9).alias("mass_ok"),
            (F.min("rank") > 0.0).alias("all_positive"),
        )
        .crossJoin(
            joined.agg(
                (
                    F.sum(F.abs(F.col("r2") - F.col("r1")))
                    <= 0.85 * F.sum(F.abs(F.col("r1") - F.col("r0"))) + 1e-12
                ).alias("contracting")
            )
        )
        .crossJoin(tops.select((F.col("ta") == F.col("tb")).alias("stable_top")))
    )


_SORTED_EXPORT_SQL = """
SELECT count(*)::BIGINT AS n_rows,
       CAST(1 AS BOOLEAN) AS within_sorted,
       CAST(1 AS BOOLEAN) AS ranges_disjoint
FROM documents
"""


@query("sorted_export_gate", _SORTED_EXPORT_SQL)
def sorted_export_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally-ordered export gate (operators/packing.py:sorted_export):
    range-partition documents by n_chars into 8 shards, sort within each,
    then DISTRIBUTIVELY prove the concatenation is the global sort —
    per-shard monotonicity via a per-partition window, shard-range
    disjointness via one lag over the 8-row (min, max) bounds table, and
    row conservation hash-checked against count(*).  This is the scalable
    ORDER BY-output path: no single task ever holds the full dataset."""
    from hnsw_spark.operators.packing import sorted_export_gate

    docs = load_table(spark, sf_dir, "documents")
    return sorted_export_gate(docs, "n_chars", 8)


_UPSERT_SQL = """
WITH base AS (
  SELECT doc_id, 1 AS version, text, 0 AS side FROM documents
), upd AS (
  SELECT doc_id, 2 AS version, upper(substr(text, 1, 50)) AS text, 1 AS side
  FROM documents WHERE doc_id % 7 = 0
), ins AS (
  SELECT doc_id + 1000000 AS doc_id, 1 AS version,
         'new:' || substr(text, 1, 20) AS text, 1 AS side
  FROM documents WHERE doc_id % 13 = 0
), unioned AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY version DESC, side DESC) AS rn,
         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id) AS n_base
  FROM unioned
)
SELECT doc_id, version,
       substr(md5(text), 1, 16) AS fp,
       CASE WHEN n_base = 0 THEN 'inserted'
            WHEN side = 1 THEN 'updated'
            ELSE 'unchanged' END AS action
FROM ranked WHERE rn = 1
"""


@query("upsert_compaction", _UPSERT_SQL)
def upsert_compaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE/compaction (operators/upsert.py:upsert_latest): a derived
    update stream (every 7th doc re-written at version 2) plus an insert
    stream (every 13th doc cloned under a new key) merges into the base
    snapshot, latest-version-wins.  Union + ONE ranking window on the key —
    no join; the survivor set (keyed by md5 fingerprint) and the per-row
    inserted/updated/unchanged action are both hash-pinned."""
    from hnsw_spark.operators.upsert import upsert_latest

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.lit(1).alias("version"), "text")
    upd = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.lit(2).alias("version"),
        F.upper(F.substring("text", 1, 50)).alias("text"),
    )
    ins = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit(1).alias("version"),
        F.concat(F.lit("new:"), F.substring("text", 1, 20)).alias("text"),
    )
    merged = upsert_latest(base, upd.unionByName(ins))
    return merged.select(
        "doc_id",
        "version",
        F.substring(F.md5("text"), 1, 16).alias("fp"),
        "action",
    )


_DSIR_B = 256
_DSIR_KEEP_PCT = 75.0  # threshold percentile for keep_frac = 0.25

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, tgt, token FROM (
    SELECT doc_id, source = 'src0' AS tgt, unnest({{w}}) AS token
    FROM documents)
  WHERE token <> ''
),
tb AS (
  SELECT doc_id, tgt,
         ('0x' || substr(md5(token), 1, 8))::BIGINT % {_DSIR_B} AS bucket,
         count(*)::BIGINT AS tf
  FROM tok GROUP BY 1, 2, 3
),
cr AS (SELECT bucket, sum(tf)::BIGINT AS c_raw FROM tb GROUP BY 1),
ct AS (SELECT bucket, sum(tf)::BIGINT AS c_tgt FROM tb WHERE tgt GROUP BY 1),
tot AS (SELECT (SELECT sum(c_raw) FROM cr)::BIGINT AS r,
               (SELECT coalesce(sum(c_tgt), 0) FROM ct)::BIGINT AS t),
lam AS (
  SELECT cr.bucket,
         floor(ln((coalesce(ct.c_tgt, 0) + 1.0) / (t + {_DSIR_B}.0))
               * 1000000.0 + 0.5)::BIGINT
       - floor(ln((cr.c_raw + 1.0) / (r + {_DSIR_B}.0))
               * 1000000.0 + 0.5)::BIGINT AS lam
  FROM cr LEFT JOIN ct USING (bucket), tot
),
per AS (
  SELECT tb.doc_id, sum(tf)::BIGINT AS n_tokens, sum(tf * lam)::BIGINT AS si
  FROM tb JOIN lam USING (bucket) GROUP BY 1
),
sc AS (SELECT doc_id, n_tokens, si, si / (n_tokens * 1000000.0) AS sco FROM per),
thr AS (
  SELECT max(CASE WHEN rn = floor({_DSIR_KEEP_PCT}/100*(n-1))+1 THEN sco END)
           AS cut
  FROM (SELECT sco, row_number() OVER (ORDER BY sco) AS rn,
               count(*) OVER () AS n FROM sc)
)
SELECT d.doc_id,
       coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
       floor(s.si::DOUBLE / s.n_tokens)::BIGINT AS score_fp,
       coalesce(s.sco >= (SELECT cut FROM thr), false) AS selected
FROM documents d LEFT JOIN sc s USING (doc_id)
""".format(w=_W)


@query("dsir_selection", _DSIR_SQL)
def dsir_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-domain data selection (Xie et al. 2023): hashed
    bag-of-unigrams importance log-ratio between the src0 target
    distribution and the raw corpus, add-1 smoothing over 256 md5 buckets,
    deterministic top-25% keep via the floor-index percentile cut
    (operators/curation.py:dsir_select).  Fixed-point ln quantization
    before the subtraction keeps every cross-engine comparison over
    identical doubles."""
    from hnsw_spark.operators.curation import dsir_select

    return dsir_select(
        load_table(spark, sf_dir, "documents"),
        target_col="source",
        target_value="src0",
        n_buckets=_DSIR_B,
        keep_frac=0.25,
    )


_HLL_ALPHA_M2 = 47072.71267120224  # embedded as the SAME double literal in the oracle

_HLL_SQL = f"""
WITH r AS (
  SELECT ('0x' || substr(md5(text), 1, 2))::BIGINT::INT AS bucket,
         ('0x' || substr(md5(text), 3, 8))::BIGINT AS rest
  FROM documents
),
regs AS (
  SELECT bucket,
         max(CASE WHEN rest = 0 THEN 33
                  ELSE 33 - length(ltrim(bin(rest), '0')) END)::INT AS rho
  FROM r GROUP BY bucket
),
agg AS (
  SELECT count(*)::BIGINT AS n_occupied,
         sum(1.0 / (1::BIGINT << rho)) AS s_occ
  FROM regs
),
ex AS (SELECT count(DISTINCT text)::BIGINT AS n_exact FROM documents),
est AS (
  SELECT n_exact, n_occupied,
         CASE WHEN raw <= 640.0 AND (256 - n_occupied) > 0
              THEN 256.0 * ln(256.0 / (256 - n_occupied))
              ELSE raw END AS e
  FROM (SELECT n_exact, n_occupied,
               {_HLL_ALPHA_M2!r} / (s_occ + (256 - n_occupied)) AS raw
        FROM agg, ex)
)
SELECT n_exact, n_occupied,
       floor(e * 10000.0 + 0.5)::BIGINT AS est_fp,
       (abs(e - n_exact) <= 3.0 * 1.04 / sqrt(256.0) * n_exact)
         AS within_bound
FROM est
"""


@query("hll_cardinality", _HLL_SQL)
def hll_cardinality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principles HyperLogLog over the document texts
    (operators/sketches.py:hll_registers/hll_estimate): md5-deterministic
    registers, integer-exact rho via binary-string length, dyadic-rational
    harmonic sum — so the whole SKETCH, not just a tolerance gate, is
    hash-checked against DuckDB rebuilding identical registers.  The
    groupBy-max register build is the mergeable one-pass shape (<= m rows
    shuffled per partition) that approx-counts 100 TB; n_exact rides along
    as the audit only."""
    from hnsw_spark.operators.sketches import hll_estimate

    return hll_estimate(
        load_table(spark, sf_dir, "documents"), "text", b=8
    )
