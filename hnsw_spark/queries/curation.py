"""Curation query surface over ``documents``: the composed keep/drop
pipeline, deterministic stratified sampling, and vocabulary statistics —
each with a DuckDB oracle built from the same SQL fragments as the
text-analysis oracles, so every rule fires identically in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnsw_spark.functions.hashing import P31, md5_bigint_sql
from hnsw_spark.operators.curation import (
    curation_flags,
    feature_hash_embeddings,
    stratified_sample,
    tfidf_top_terms,
    vocab_stats,
)
from hnsw_spark.operators.evaluation import dquant
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


_ATTRITION_SQL = f"""
WITH cur AS ({_CURATION_SQL}),
rep AS ({{REP}}),
lp AS ({{LP}}),
j AS (
  SELECT cur.doc_id,
         coalesce(cur.drop_reason,
                  CASE WHEN rep.top_2gram_frac > 0.10
                         OR rep.dup_word_frac > 0.70 THEN 'repetitive' END,
                  CASE WHEN lp.logprob < -3.5 THEN 'incoherent' END,
                  'kept') AS drop_reason
  FROM cur JOIN rep USING (doc_id) JOIN lp USING (doc_id)
)
SELECT drop_reason, count(*)::BIGINT AS n_docs,
       CAST(floor(count(*)::DOUBLE / (SELECT count(*) FROM j) * 1e6 + 0.5)
            AS BIGINT) AS share_fp
FROM j GROUP BY drop_reason
"""


def _attrition_sql() -> str:
    from hnsw_spark.queries.text import _LOGPROB_SQL, _REPETITION_SQL

    return _ATTRITION_SQL.replace("{REP}", _REPETITION_SQL).replace(
        "{LP}", _LOGPROB_SQL
    )


@query("corpus_attrition", _attrition_sql())
def corpus_attrition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline attrition: dedup election + length +
    quality + language + repetition + corpus-LM fluency gates in fixed
    priority, aggregated to one row per drop reason with corpus share —
    the whole training-data pipeline value-hash-checked as one query
    (see operators/curation.py:pipeline_attrition)."""
    from hnsw_spark.operators.curation import pipeline_attrition

    res = pipeline_attrition(load_table(spark, sf_dir, "documents"))
    return res.select(
        "drop_reason", "n_docs", dquant("share", 6).alias("share_fp")
    )


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


_FH_DIM = 64


def _feature_hash_sql(dim: int) -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN bucket = {i} THEN sign ELSE 0.0 END) AS b{i}"
        for i in range(dim)
    )
    arr = "[" + ", ".join(f"b{i}" for i in range(dim)) + "]"
    return f"""
WITH toks AS (
  SELECT doc_id AS id, {md5_bigint_sql("tok")} % {P31} AS h FROM (
    SELECT doc_id, unnest({_W}) AS tok FROM documents) WHERE tok != ''
),
b AS (
  SELECT id, h % {dim} AS bucket,
         CASE WHEN h % {2 * dim} >= {dim} THEN -1.0 ELSE 1.0 END AS sign
  FROM toks
),
sums AS (SELECT id, {sums} FROM b GROUP BY id),
vec AS (
  SELECT id, {arr} AS raw,
         sqrt(list_sum(list_transform({arr}, x -> x * x))) AS nrm
  FROM sums
)
SELECT id,
       CAST(floor((CASE WHEN nrm = 0 THEN raw[1] ELSE raw[1] / nrm END)
            * 1e6 + 0.5) AS BIGINT) AS e0_fp,
       CAST(floor((CASE WHEN nrm = 0 THEN raw[2] ELSE raw[2] / nrm END)
            * 1e6 + 0.5) AS BIGINT) AS e1_fp,
       CAST(floor((CASE WHEN nrm = 0 THEN list_sum(raw)
             ELSE list_sum(raw) / nrm END) * 1e6 + 0.5) AS BIGINT) AS e_sum_fp,
       CAST(floor((CASE WHEN nrm = 0
             THEN list_sum(list_transform(raw, x -> abs(x)))
             ELSE list_sum(list_transform(raw, x -> abs(x))) / nrm END)
            * 1e6 + 0.5) AS BIGINT) AS e_abs_sum_fp
FROM vec
"""


@query("text_hash_embeddings", _feature_hash_sql(_FH_DIM))
def text_hash_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embeddings (HashingTF recipe, 64-dim, signed,
    L2-normalized) — the model-free bridge from documents into the vector
    tiers; vector pinned through scalar projections (first components, sum,
    L1 mass) for the value-hash harness."""
    emb = feature_hash_embeddings(
        load_table(spark, sf_dir, "documents"), dim=_FH_DIM
    )
    e = F.col("embedding")
    return emb.select(
        "id",
        dquant(F.element_at(e, 1), 6).alias("e0_fp"),
        dquant(F.element_at(e, 2), 6).alias("e1_fp"),
        dquant(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + x), 6
        ).alias("e_sum_fp"),
        dquant(
            F.aggregate(e, F.lit(0.0), lambda a, x: a + F.abs(x)), 6
        ).alias("e_abs_sum_fp"),
    )


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
         tf.tf * (ln((n.n_docs + 1)::DOUBLE / (dfreq.df + 1)) + 1.0) AS weight
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
  -- rank on the 1e-9 fixed-point weight, mirroring the Spark side: ln is
  -- not correctly-rounded IEEE, so ranking raw doubles could flip a
  -- near-tie across engines (ADVICE r7)
  SELECT *, row_number() OVER (
    PARTITION BY id
    ORDER BY CAST(floor(weight * 1e9 + 0.5) AS BIGINT) DESC, token) AS rank
  FROM weighted
)
SELECT id, rank::INT AS rank, token, tf, df,
       CAST(floor(weight * 1e6 + 0.5) AS BIGINT) AS weight_fp
FROM ranked WHERE rank <= 5
"""


@query("tfidf_top_terms", _TFIDF_SQL)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document with smoothed idf and a deterministic
    (weight desc, token) tie-break — the retrieval-style text scoring layer
    over the vocab statistics."""
    res = tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=5)
    return res.select(
        "id", "rank", "token", "tf", "df",
        dquant("weight", 6).alias("weight_fp"),
    )


@query("vocab_stats", _VOCAB_SQL)
def vocab_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary by term frequency with document frequency,
    (tf desc, token) total order so the truncation boundary is deterministic.
    Explode → one token shuffle with map-side partials → TakeOrdered."""
    return vocab_stats(load_table(spark, sf_dir, "documents"), top_n=100)


_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN u < 0.1 THEN 'test'
            WHEN u < 0.9 THEN 'train'
            ELSE 'val' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents)
"""


@query("dataset_split", _SPLIT_SQL)
def dataset_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: pure hash row
    expression, stable under corpus appends (a doc's split never changes
    when data grows — the anti-leakage property), zero shuffles
    (operators/curation.py:dataset_split)."""
    from hnsw_spark.operators.curation import dataset_split

    docs = load_table(spark, sf_dir, "documents")
    return dataset_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


_NEG_K = 4

_CONTRASTIVE_SQL = f"""
WITH k AS (
  SELECT doc_id,
         md5(doc_id::VARCHAR || 'shuffle') AS key,
         ('0x' || substr(md5(doc_id::VARCHAR || 'shuffle'), 1, 8))::BIGINT
           % 1024 AS bucket
  FROM documents),
p AS (
  SELECT doc_id AS anchor_id,
         (row_number() OVER (ORDER BY bucket, key, doc_id) - 1)::BIGINT AS pos
  FROM k),
n AS (SELECT count(*)::BIGINT AS n FROM p),
e AS (
  SELECT anchor_id, j.j::INT AS j,
         (pos + 1 + floor(
            (('0x' || substr(md5(anchor_id::VARCHAR || ':' || j.j::VARCHAR
                                 || 'neg'), 1, 8))::BIGINT / 4294967296.0)
            * (n.n - 1))::BIGINT) % n.n AS neg_pos
  FROM p, n, (SELECT unnest(generate_series(1, {_NEG_K})) AS j) j
)
SELECT e.anchor_id, e.j, p2.anchor_id AS negative_id
FROM e JOIN p p2 ON p2.pos = e.neg_pos
"""


@query("contrastive_pairs", _CONTRASTIVE_SQL)
def contrastive_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over documents (4 negatives per
    anchor, self-pairs excluded by construction): hash-positioned draws
    over the global_shuffle order, exact in doubles, so the oracle replays
    the identical pair set (operators/curation.py:contrastive_pairs)."""
    from hnsw_spark.operators.curation import contrastive_pairs

    docs = load_table(spark, sf_dir, "documents")
    return contrastive_pairs(docs, k_negatives=_NEG_K)


# ---- chunk-pooled document embeddings (the RAG bridge) ----------------------
# chunk → per-chunk hash embedding → fixed-point mean-pool → L2 normalize.
# Pooling is engine-invariant by construction: chunk components quantize to
# BIGINT (q = floor(c·10⁶ + 0.5)) BEFORE the cross-chunk sum, so Σq is exact
# under any addition order, and the final normalized value Sq/√(Σ Sq²) uses
# only exact integer inputs (the n·10⁶ pooling scale cancels).

_CP_DIM, _CP_CHUNK, _CP_OVERLAP = 32, 64, 16
_CP_STRIDE = _CP_CHUNK - _CP_OVERLAP
_CW = r"string_split_regex(trim(lower(chunk_text)), '\s+')"


def _chunk_pooled_sql() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN bucket = {i} THEN sign ELSE 0.0 END) AS b{i}"
        for i in range(_CP_DIM)
    )
    arr = "[" + ", ".join(f"b{i}" for i in range(_CP_DIM)) + "]"
    return f"""
WITH b AS (SELECT doc_id, {_W} AS w, len({_W})::BIGINT AS n FROM documents),
ch AS (
  SELECT doc_id,
         doc_id * 1000 + (s.s / {_CP_STRIDE})::BIGINT AS cid,
         array_to_string(w[s.s + 1 : s.s + {_CP_CHUNK}], ' ') AS chunk_text
  FROM b,
       unnest(generate_series(
         0,
         greatest(floor((n - 1) / {_CP_STRIDE})::BIGINT * {_CP_STRIDE}, 0),
         {_CP_STRIDE})) AS s(s)
),
toks AS (
  SELECT cid, doc_id, {md5_bigint_sql("tok")} % {P31} AS h FROM (
    SELECT cid, doc_id, unnest({_CW}) AS tok FROM ch) WHERE tok != ''
),
bk AS (
  SELECT cid, doc_id, h % {_CP_DIM} AS bucket,
         CASE WHEN h % {2 * _CP_DIM} >= {_CP_DIM} THEN -1.0 ELSE 1.0 END AS sign
  FROM toks
),
sums AS (SELECT cid, doc_id, {sums} FROM bk GROUP BY cid, doc_id),
vec AS (
  SELECT cid, doc_id, {arr} AS raw,
         sqrt(list_sum(list_transform({arr}, x -> x * x))) AS nrm
  FROM sums
),
q AS (
  SELECT doc_id, k.k,
         floor((CASE WHEN nrm = 0 THEN raw[k.k + 1]
                     ELSE raw[k.k + 1] / nrm END) * 1000000.0 + 0.5)::BIGINT
           AS qv
  FROM vec, (SELECT unnest(generate_series(0, {_CP_DIM} - 1)) AS k) k
),
sq AS (SELECT doc_id, k, sum(qv)::BIGINT AS s FROM q GROUP BY doc_id, k),
s2 AS (SELECT doc_id, sum(s * s)::BIGINT AS s2 FROM sq GROUP BY doc_id)
SELECT sq.doc_id, sq.k::INT AS k,
       CAST(floor(sq.s / sqrt(s2.s2) * 1e6 + 0.5) AS BIGINT) AS value_fp
FROM sq JOIN s2 USING (doc_id)
"""


@query("chunk_pooled_embeddings", _chunk_pooled_sql())
def chunk_pooled_embeddings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document embeddings by mean-pooling chunk-level hash embeddings
    (chunk 64/overlap 16 → 32-dim signed HashingTF per chunk → fixed-point
    pool → L2 normalize) — the model-free RAG indexing path from long
    documents into the ANN tiers.  Long-form (doc_id, k, value); the
    oracle replays chunking, hashing, pooling, and normalization from
    first principles."""
    from hnsw_spark.operators.curation import feature_hash_embeddings
    from hnsw_spark.operators.packing import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    # chunk_tokens instead of chunk_text: the embedding pass consumes the
    # token slice directly, so the array_join + regexp re-split round
    # trip (two full string passes over the chunked corpus) is pruned
    # out of the plan entirely — same tokens by the words()-idempotence
    # argument in chunk_documents/feature_hash_embeddings
    chunks = chunk_documents(
        docs, chunk_size=_CP_CHUNK, overlap=_CP_OVERLAP, with_tokens=True
    ).select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"),
        "chunk_tokens",
    )
    emb = feature_hash_embeddings(
        chunks, dim=_CP_DIM, tokens_col="chunk_tokens", id_col="cid"
    )
    comps = emb.select(
        F.floor(F.col("id") / 1000).cast("long").alias("doc_id"),
        F.posexplode("embedding").alias("k", "v"),
    ).select(
        "doc_id",
        "k",
        F.floor(F.col("v") * 1000000.0 + 0.5).cast("long").alias("qv"),
    )
    sq = comps.groupBy("doc_id", "k").agg(F.sum("qv").alias("s"))
    # norm via a doc-partitioned window (32 rows per partition) instead of
    # a second aggregate + self-join: the chunk→hash→pool pipeline above
    # is evaluated ONCE (the join formulation recomputed it for both
    # branches), and the BIGINT Σs² is order-insensitive so results are
    # unchanged
    w = Window.partitionBy("doc_id")
    return sq.withColumn(
        "s2", F.sum(F.col("s") * F.col("s")).over(w)
    ).select(
        "doc_id",
        "k",
        dquant(F.col("s") / F.sqrt(F.col("s2")), 6).alias("value_fp"),
    )


_CURRICULUM_SQL = f"""
WITH q AS (SELECT doc_id, {QUALITY_SQL} AS quality FROM documents),
ord AS (SELECT quality, row_number() OVER (ORDER BY quality) - 1 AS rn FROM q),
n AS (SELECT count(*)::BIGINT AS c FROM q),
th AS (SELECT
  (SELECT quality FROM ord, n WHERE rn = floor(33 * (c - 1) / 100.0)) AS t33,
  (SELECT quality FROM ord, n WHERE rn = floor(66 * (c - 1) / 100.0)) AS t66)
SELECT q.doc_id, q.quality,
       CASE WHEN q.quality >= th.t66 THEN 'warmup'
            WHEN q.quality >= th.t33 THEN 'main'
            ELSE 'anneal' END AS phase,
       substr(md5('cur' || q.doc_id::VARCHAR), 1, 16) AS order_key
FROM q, th
"""


@query("curriculum_phases", _CURRICULUM_SQL)
def curriculum_phases_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum phase assignment (easy→hard training order):
    terciles of the heuristic quality score split the corpus into
    warmup/main/anneal phases, and a deterministic md5 order key shuffles
    WITHIN each phase (the global_shuffle convention).

    Scale shape: phase assignment is a scan-stage CASE against a
    broadcast 1-row threshold frame; curriculum ordering at 100 TB is
    (phase, order_key) — a sort key, not a materialized global sort.
    Thresholds here use the exact floor-index percentile operator (the
    oracle-parity tier: one single-column global ranking); at corpus
    scale the drop-in replacement is the one-pass approx_percentile
    sketch, already gated within 5% by percentile_sketch_gate."""
    from hnsw_spark.functions.text import quality_score_w, words
    from hnsw_spark.operators.evaluation import percentile_floor

    from hnsw_spark.plans.cachereg import owned_persist

    d = load_table(spark, sf_dir, "documents")
    # persisted: the threshold subtree (percentile ranking) and the final
    # scan both consume q, and each would otherwise re-run the regexp-heavy
    # quality-score pipeline (library-owned; released per action)
    q = owned_persist(
        d.select(
            "doc_id",
            quality_score_w(F.col("text"), words("text")).alias("quality"),
        )
    )
    th = percentile_floor(q, "quality", [33, 66])
    return q.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "quality",
        F.when(F.col("quality") >= F.col("p66"), "warmup")
        .when(F.col("quality") >= F.col("p33"), "main")
        .otherwise("anneal")
        .alias("phase"),
        F.substring(
            F.md5(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))), 1, 16
        ).alias("order_key"),
    )


_WSAMPLE_N = 200

_WSAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         greatest(n_chars, 1) AS weight,
         floor(-ln((('0x' || substr(md5(doc_id::VARCHAR || 'ws1'), 1, 8))::BIGINT + 1)
                   / 4294967296.0)
               / greatest(n_chars, 1) * 1e12 + 0.5)::BIGINT AS key_fp
  FROM documents
)
SELECT row_number() OVER (ORDER BY key_fp, doc_id) AS sel_rank, doc_id, weight
FROM keyed
ORDER BY key_fp, doc_id
LIMIT {_WSAMPLE_N}
"""


@query("weighted_sample", _WSAMPLE_SQL)
def weighted_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement: a fixed
    200-document budget drawn with probability proportional to document
    length (operators/curation.py:weighted_sample).  The exponential key
    comes from the md5 unit hash — no RNG stream — and is quantized to
    1e-12 fixed point before the (key, id) total order, so both engines
    make the identical cut; the plan is one scan + TakeOrderedAndProject,
    no global sort."""
    from hnsw_spark.operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, _WSAMPLE_N, weight_col="n_chars", salt="ws1")


_OUTLIER_SQL = """
WITH pos AS (
  SELECT label, vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         (sum(floor(v::DOUBLE * 1000000.0 + 0.5)::BIGINT))::DOUBLE / 1000000.0
           / count(*) AS c
  FROM pos GROUP BY label, pos
),
cent_arr AS (SELECT label, list(c ORDER BY pos) AS cent FROM cent GROUP BY label),
d AS (
  SELECT e.vec_id, e.label, list_distance(e.embedding::DOUBLE[], ca.cent) AS d
  FROM embeddings e JOIN cent_arr ca ON e.label = ca.label
),
st AS (
  SELECT label,
         (sum(floor(d * 1000000.0 + 0.5)::BIGINT))::DOUBLE / 1000000.0
           / count(*) AS mean_d,
         (sum(floor(d * d * 1000000.0 + 0.5)::BIGINT))::DOUBLE / 1000000.0
           / count(*) AS m2
  FROM d GROUP BY label
),
thr AS (
  SELECT label, mean_d, sqrt(greatest(m2 - mean_d * mean_d, 0.0)) AS sd FROM st
)
SELECT d.vec_id, d.label,
       CAST(floor(d.d * 1e6 + 0.5) AS BIGINT) AS dist_fp,
       CAST(floor((t.mean_d + 2.0 * t.sd) * 1e6 + 0.5) AS BIGINT) AS threshold_fp
FROM d JOIN thr t ON d.label = t.label
WHERE d.d > t.mean_d + 2.0 * t.sd
"""


@query("embedding_outliers", _OUTLIER_SQL)
def embedding_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier screen (operators/curation.py:
    embedding_outliers): vectors farther than mean + 2σ from their label
    centroid.  Centroids, distance moments, and therefore the flag
    threshold all use the dsum fixed-point convention, so the flagged set
    is identical across engines and partitionings — the oracle recomputes
    the whole chain from first principles."""
    from hnsw_spark.operators.curation import embedding_outliers

    emb = load_table(spark, sf_dir, "embeddings")
    res = embedding_outliers(emb, k_sigma=2.0)
    return res.select(
        "vec_id", "label",
        dquant("dist", 6).alias("dist_fp"),
        dquant("threshold", 6).alias("threshold_fp"),
    )


_TOKEN_BUDGET_SQL = f"""
WITH d AS (
  SELECT doc_id, len({_W})::BIGINT AS tokens, {QUALITY_SQL} AS quality
  FROM documents
), b AS (
  SELECT (sum(tokens)::BIGINT // 2) AS budget FROM d
), o AS (
  SELECT doc_id, tokens, quality,
         sum(tokens) OVER (ORDER BY quality DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)::BIGINT AS cum
  FROM d
)
SELECT doc_id, tokens, quality, (cum <= budget) AS selected FROM o, b
"""


@query("token_budget_selection", _TOKEN_BUDGET_SQL)
def token_budget_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-greedy selection of the best half of the corpus by token
    budget (operators/curation.py:token_budget_select).  The oracle is the
    textbook global-sort running sum; the Spark plan is the two-pass
    bucket-threshold equivalent — per-bucket totals (≤1001 driver rows) to
    locate the cut, a window over ONLY the boundary bucket — which selects
    the EXACT same set without ever totally ordering the corpus."""
    from hnsw_spark.operators.curation import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_select(docs, budget_fraction=0.5)


_KS_A = tuple(f"src{i}" for i in range(10))

_KS_SQL = f"""
WITH q AS (
  SELECT CASE WHEN source IN ({", ".join(f"'{s}'" for s in _KS_A)})
              THEN 0 ELSE 1 END AS grp,
         {QUALITY_SQL} AS quality
  FROM documents
), c AS (
  SELECT quality, 
         count(*) FILTER (WHERE grp = 0)::BIGINT AS c0,
         count(*) FILTER (WHERE grp = 1)::BIGINT AS c1
  FROM q GROUP BY quality
), n AS (
  SELECT sum(c0)::BIGINT AS n0, sum(c1)::BIGINT AS n1 FROM c
), cum AS (
  SELECT quality,
         sum(c0) OVER (ORDER BY quality
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS f0,
         sum(c1) OVER (ORDER BY quality
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS f1
  FROM c
)
SELECT n0, n1,
       CAST(floor(max(abs(f0 * n1 - f1 * n0)) / (n0 * n1) * 1e6 + 0.5)
            AS BIGINT) AS ks_stat_fp
FROM cum, n
GROUP BY n0, n1
"""


@query("quality_drift_ks", _KS_SQL)
def quality_drift_ks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: the two-sample Kolmogorov-Smirnov
    statistic between the quality-score distributions of two source
    cohorts (src0-9 vs src10-19) — the standard gate for "did this week's
    crawl change quality?".

    Exactness: KS is max |CDF₀ − CDF₁|; both CDFs are INTEGER cumulative
    counts, so the statistic is computed as max |f0·n1 − f1·n0| / (n0·n1)
    — one integer cross-multiplication, divided once at the end — and is
    therefore engine-exact with no float accumulation at all.

    Scale shape: one groupBy on the (already 1e-6-quantized) quality value
    collapses the corpus to ≤ #distinct-values aggregate rows; the
    ordered cumulative window runs over THAT skinny frame, never the
    corpus."""
    from hnsw_spark.functions.text import quality_score_w, words

    docs = load_table(spark, sf_dir, "documents")
    grp = F.when(F.col("source").isin(*_KS_A), F.lit(0)).otherwise(F.lit(1))
    q = docs.select(
        grp.alias("grp"),
        quality_score_w(F.col("text"), words("text")).alias("quality"),
    )
    from hnsw_spark.plans.cachereg import owned_persist

    # persisted: the totals aggregate and the cumulative window both
    # consume c — without it the corpus-wide quality pipeline + groupBy
    # runs twice (c itself is skinny: <= #distinct quality values)
    c = owned_persist(
        q.groupBy("quality").agg(
            F.sum((F.col("grp") == 0).cast("long")).alias("c0"),
            F.sum((F.col("grp") == 1).cast("long")).alias("c1"),
        )
    )
    n = c.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    w = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = c.select(
        F.sum("c0").over(w).alias("f0"), F.sum("c1").over(w).alias("f1")
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .groupBy("n0", "n1")
        .agg(
            dquant(
                F.max(
                    F.abs(
                        F.col("f0") * F.col("n1") - F.col("f1") * F.col("n0")
                    )
                )
                / (F.col("n0") * F.col("n1")),
                6,
            ).alias("ks_stat_fp")
        )
    )


_AUC_SQL = f"""
WITH q AS (
  SELECT CASE WHEN source IN ({", ".join(f"'{s}'" for s in _KS_A)})
              THEN 0 ELSE 1 END AS grp,
         {{QUALITY_SQL}} AS quality
  FROM documents
), c AS (
  SELECT quality,
         count(*) FILTER (WHERE grp = 0)::BIGINT AS c0,
         count(*) FILTER (WHERE grp = 1)::BIGINT AS c1
  FROM q GROUP BY quality
), n AS (
  SELECT sum(c0)::BIGINT AS n0, sum(c1)::BIGINT AS n1 FROM c
), cum AS (
  SELECT c1, c0 + c1 AS cnt,
         coalesce(sum(c0 + c1) OVER (ORDER BY quality
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cum_before
  FROM c
), r AS (
  SELECT sum(c1 * (2 * cum_before + cnt + 1))::BIGINT AS two_r1 FROM cum
)
SELECT n0, n1,
       (two_r1 - n1 * (n1 + 1))::BIGINT AS auc_num,
       CAST(floor((two_r1 - n1 * (n1 + 1)) / (2.0 * n0 * n1) * 1e6 + 0.5)
            AS BIGINT) AS auc_fp
FROM r, n
""".format(QUALITY_SQL=QUALITY_SQL)


@query("quality_auc", _AUC_SQL)
def quality_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the quality score as a separator of the two source
    cohorts — the standard "is this classifier better than chance" gate
    for corpus-curation models, computed EXACTLY via the Mann-Whitney
    rank-sum identity (AUC = U₁/(n₀n₁)) instead of threshold-sweep
    trapezoids.

    Ties get average ranks, which have denominator 2 — so 2·R₁ =
    Σ c₁(2·cum_before + cnt + 1) is pure BIGINT and the AUC numerator
    (2R₁ − n₁(n₁+1)) is integer-exact in any engine; one division at the
    end, same recipe as quality_drift_ks.  Scale shape identical too:
    the corpus collapses to ≤ #distinct-score aggregate rows before any
    window runs."""
    from hnsw_spark.functions.text import quality_score_w, words

    docs = load_table(spark, sf_dir, "documents")
    grp = F.when(F.col("source").isin(*_KS_A), F.lit(0)).otherwise(F.lit(1))
    q = docs.select(
        grp.alias("grp"),
        quality_score_w(F.col("text"), words("text")).alias("quality"),
    )
    from hnsw_spark.plans.cachereg import owned_persist

    # owned_persist (was a bare .persist() with no release handle — the
    # exact storage-leak class cachereg exists for)
    c = owned_persist(
        q.groupBy("quality").agg(
            F.sum((F.col("grp") == 0).cast("long")).alias("c0"),
            F.sum((F.col("grp") == 1).cast("long")).alias("c1"),
        )
    )
    n = c.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
    )
    w = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = c.select(
        "c1",
        (F.col("c0") + F.col("c1")).alias("cnt"),
        F.coalesce(
            F.sum(F.col("c0") + F.col("c1")).over(w), F.lit(0)
        ).alias("cum_before"),
    )
    r = cum.agg(
        F.sum(
            F.col("c1") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("two_r1")
    )
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            "n0",
            "n1",
            (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
            .cast("long")
            .alias("auc_num"),
            dquant(
                (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
                / (2.0 * F.col("n0") * F.col("n1")),
                6,
            ).alias("auc_fp"),
        )
    )


from hnsw_spark.queries.dedup import _shingle_sql as _dedup_shingle_sql

_XSPLIT_JACC_T = 0.4

_XSPLIT_SQL = """
WITH splits AS (
  SELECT doc_id,
         CASE WHEN u < 0.1 THEN 'test'
              WHEN u < 0.9 THEN 'train'
              ELSE 'val' END AS split
  FROM (SELECT doc_id,
               ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                 / 4294967296.0 AS u
        FROM documents)
),
fp AS (
  SELECT d.doc_id, substr(md5({NORM}), 1, 16) AS fingerprint, s.split
  FROM documents d JOIN splits s ON d.doc_id = s.doc_id
),
exact_leaks AS (
  SELECT fingerprint
  FROM fp GROUP BY fingerprint
  HAVING max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) = 1
     AND max(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) = 1
),
docs AS (SELECT doc_id, {W} AS w FROM documents),
sh_all AS (
  SELECT DISTINCT doc_id AS id, shingle FROM (
    SELECT doc_id, unnest({SHINGLES}) AS shingle FROM docs)
),
sizes AS (SELECT id, count(*)::BIGINT AS sz FROM sh_all GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_common
  FROM sh_all a JOIN sh_all b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
ndpairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
  WHERE n_common / (sa.sz + sb.sz - n_common) >= {T}
),
cross_pairs AS (
  SELECT p.id_a FROM ndpairs p
  JOIN splits s1 ON s1.doc_id = p.id_a
  JOIN splits s2 ON s2.doc_id = p.id_b
  WHERE (s1.split = 'train') <> (s2.split = 'train')
)
SELECT (SELECT count(*) FROM splits WHERE split = 'train')::BIGINT
         AS n_train,
       (SELECT count(*) FROM splits WHERE split <> 'train')::BIGINT
         AS n_eval,
       (SELECT count(*) FROM exact_leaks)::BIGINT AS n_exact_leaks,
       (SELECT count(*) FROM cross_pairs)::BIGINT AS n_neardup_cross_pairs
"""


@query(
    "cross_split_contamination_gate",
    _XSPLIT_SQL.format(
        NORM=_NORM, W=_W, SHINGLES=_dedup_shingle_sql(2), T=_XSPLIT_JACC_T
    ),
)
def cross_split_contamination_gate_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/eval leakage audit ACROSS the split boundary — the check that
    benchmark decontamination does not cover: documents whose exact
    fingerprint, or a ≥0.4-Jaccard near-duplicate, appears on BOTH sides
    of the train/eval cut.  Held-out loss measured on leaked eval docs is
    memorization, not generalization, so this count gates every split
    re-materialization in a real pipeline.

    One fingerprint shuffle for the exact tier (groupBy fingerprint with
    two boolean max's — never a self-join); the near-dup tier reuses the
    shingle equi-join (Σ df², bounded by doc frequency) and only then
    looks up the two sides' splits, which are scan-stage hash expressions
    (dataset_split is a pure row function, so the 'join' to splits costs
    nothing at scale — it is recomputed inline, not shuffled).

    Deliberately NOT the PPJoin prefix filter here: at this audit's LOW
    threshold (0.4) the prefix is ~60% of every shingle set, so candidates
    barely prune while the filter adds a per-doc frequency sort, a
    candidate distinct, and a two-sided verification join — measured 9×
    slower than the direct Σ df² join at sf0.1.  ``jaccard_prefix_pairs``
    is the right tool in the high-threshold near-dup regime
    (``jaccard_prefix_filter``); threshold decides the winner."""
    from hnsw_spark.functions.text import fingerprint
    from hnsw_spark.operators.curation import dataset_split
    from hnsw_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    splits = dataset_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", (F.col("split") == "train").alias("in_train"))

    fp = docs.select(
        "doc_id", fingerprint("text").alias("fingerprint")
    ).join(splits, "doc_id")
    exact_leaks = (
        fp.groupBy("fingerprint")
        .agg(
            F.max(F.col("in_train").cast("int")).alias("t"),
            F.max((~F.col("in_train")).cast("int")).alias("e"),
        )
        .filter((F.col("t") == 1) & (F.col("e") == 1))
        .agg(F.count("*").alias("n_exact_leaks"))
    )

    pairs = ngram_jaccard_pairs(
        docs, n=2, threshold=_XSPLIT_JACC_T, max_doc_freq=None
    ).select("id_a", "id_b")
    sa = splits.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
        "in_train", "train_a"
    )
    sb = splits.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
        "in_train", "train_b"
    )
    cross = (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(F.col("train_a") != F.col("train_b"))
        .agg(F.count("*").alias("n_neardup_cross_pairs"))
    )

    counts = splits.agg(
        F.sum(F.col("in_train").cast("long")).alias("n_train"),
        F.sum((~F.col("in_train")).cast("long")).alias("n_eval"),
    )
    return (
        counts.crossJoin(F.broadcast(exact_leaks))
        .crossJoin(F.broadcast(cross))
        .select("n_train", "n_eval", "n_exact_leaks", "n_neardup_cross_pairs")
    )


_ECE_BINS = 10

_ECE_SQL = f"""
WITH s AS (
  SELECT CASE WHEN source IN ({", ".join(f"'{s}'" for s in _KS_A)})
              THEN 0 ELSE 1 END AS y,
         ({{Z}}) AS z
  FROM documents
), p AS (
  SELECT y,
         floor((0.5 + 0.5 * z / (1 + abs(z))) * 1000000.0 + 0.5)::BIGINT
           AS p_fp
  FROM s
), b AS (
  SELECT least((p_fp // 100000)::INT, {_ECE_BINS - 1}) AS bin,
         count(*)::BIGINT AS n,
         sum(y)::BIGINT AS n_pos,
         sum(p_fp)::BIGINT AS sum_p_fp
  FROM p GROUP BY 1
), t AS (
  SELECT sum(abs(n_pos * 1000000 - sum_p_fp))::BIGINT AS ece_num,
         sum(n)::BIGINT AS n_total
  FROM b
)
SELECT bin, n, n_pos, sum_p_fp,
       CAST(floor(sum_p_fp / (n * 1000000.0) * 1e6 + 0.5) AS BIGINT) AS conf_fp,
       CAST(floor(n_pos / (n * 1.0) * 1e6 + 0.5) AS BIGINT) AS acc_fp,
       abs(n_pos * 1000000 - sum_p_fp)::BIGINT AS gap_fp,
       CAST(floor(ece_num / (n_total * 1000000.0) * 1e6 + 0.5) AS BIGINT) AS ece_fp
FROM b, t
"""


def _ece_sql() -> str:
    from hnsw_spark.queries.dedup import _z_sql

    return _ECE_SQL.format(Z=_z_sql())


@query("calibration_bins", _ece_sql())
def calibration_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration reliability table + expected calibration
    error: the quality classifier's rational-sigmoid probability binned
    into 10 equal-width bins, each holding its count, positive rate
    (label = the high-quality source cohort, same cohorts as
    ``quality_auc``/``quality_drift_ks``), mean confidence, and the
    fixed-point |accuracy − confidence| gap; every row also carries the
    corpus ECE = Σ n_b/N·|acc_b − conf_b| — the standard "can I trust the
    classifier's probabilities as sampling weights" gate that complements
    AUC (ranking) and kappa (agreement).

    Exactness: p_fp is the dquant of a RATIONAL sigmoid (no libm), so bin
    membership, bin sums, and the ECE numerator
    Σ|n_pos·10⁶ − Σp_fp| are pure BIGINT arithmetic in both engines; the
    two displayed ratios divide exact integers once and round.

    Scale shape: classifier + binning fuse into the scan stage; one
    10-group aggregate; the ECE total is a single-row broadcast attach."""
    from hnsw_spark.operators.curation import quality_prob
    from hnsw_spark.operators.evaluation import dquant

    docs = load_table(spark, sf_dir, "documents")
    y = (
        F.when(F.col("source").isin(*_KS_A), F.lit(0))
        .otherwise(F.lit(1))
        .alias("y")
    )
    p = docs.select(y, dquant(quality_prob("text"), 6).alias("p_fp"))
    b = (
        p.select(
            F.least(
                F.expr("p_fp div 100000").cast("int"), F.lit(_ECE_BINS - 1)
            ).alias("bin"),
            "y",
            "p_fp",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p_fp").alias("sum_p_fp"),
        )
    )
    t = b.agg(
        F.sum(F.abs(F.col("n_pos") * 1000000 - F.col("sum_p_fp"))).alias(
            "ece_num"
        ),
        F.sum("n").alias("n_total"),
    )
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        "n",
        "n_pos",
        "sum_p_fp",
        dquant(F.col("sum_p_fp") / (F.col("n") * 1000000.0), 6).alias(
            "conf_fp"
        ),
        dquant(F.col("n_pos") / F.col("n").cast("double"), 6).alias("acc_fp"),
        F.abs(F.col("n_pos") * 1000000 - F.col("sum_p_fp")).alias("gap_fp"),
        dquant(
            F.col("ece_num") / (F.col("n_total") * 1000000.0), 6
        ).alias("ece_fp"),
    )
