"""Training-data curation operators: keep/drop decisions, deterministic
stratified sampling, and corpus vocabulary statistics.

These extend the reference's surface (which stops at vector search) with the
operations a large-scale training-data pipeline needs around the dedup ladder
(operators/dedup.py) and text analysis (functions/text.py).  Everything here
is pure Catalyst — no Python UDFs — and every output is deterministic, so each
query is DuckDB-oracle-checkable and safe to re-run incrementally at 100 TB.

Scale notes:
- ``curation_flags`` costs ONE shuffle (the window over the fingerprint for
  canonical-copy election); every other signal is a per-row expression that
  pipelines inside the same whole-stage-codegen span.
- ``stratified_sample`` is shuffle-FREE: the keep decision is a pure hash of
  the row id, so it pushes into the scan stage, needs no sampling state, and
  is reproducible across runs/engines (unlike Bernoulli ``sampleBy`` whose
  RNG stream is partitioning-dependent).
- ``vocab_stats`` is the canonical explode → groupBy shape: one shuffle on
  the token, with map-side partial aggregation doing most of the work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hnsw_spark.plans.cachereg import owned_persist
from hnsw_spark.functions.text import (
    fingerprint,
    lang_id_w,
    quality_score_w,
    words,
)

# md5-prefix hash mapped to [0, 1): deterministic, engine-portable sampling
_HASH_SPACE = float(1 << 32)  # 8 hex chars


def _unit_hash(col, salt: str) -> F.Column:
    """Uniform [0,1) hash of a column value — identical in Spark
    (``conv(hex,16,10)``) and DuckDB (``('0x'||hex)::BIGINT``)."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def curation_flags(
    df: DataFrame,
    min_words: int = 5,
    min_quality: float = 0.5,
    allowed_langs: tuple[str, ...] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document keep/drop decision composing the pipeline's signals:
    exact-dup canonical election, length floor, quality floor, language gate.

    ``drop_reason`` reports the FIRST failing rule in a fixed priority order
    (duplicate → too_short → low_quality → lang), so downstream attrition
    dashboards are stable; ``keep`` is its null-ness.  Duplicate election
    keeps the lowest id per normalized-text fingerprint (the exact_dedup
    convention, operators/dedup.py).

    ``carry_cols`` threads the named input columns through to the output
    unchanged.  A composing pipeline that needs the surviving documents
    themselves (not just their ids) passes e.g. ``carry_cols=("text",)``
    and filters on ``keep`` directly — WITHOUT it the caller must join the
    flags back to the input on id, which re-reads (or worse, re-computes)
    the whole input a second time and pays two join shuffles on top of the
    fingerprint window's; WITH it the carried columns ride the one window
    exchange this operator already owns."""
    reserved = {"doc_id", "n_words", "quality", "lang_pred", "drop_reason", "keep"}
    if bad := [c for c in carry_cols if c in reserved or c == id_col]:
        raise ValueError(f"carry_cols collide with output columns: {bad}")
    # text_col is already selected (aliased "text"); other carried columns
    # come through verbatim
    extra = [F.col(c) for c in carry_cols if c != text_col]
    carry = [
        (F.col("text").alias(c) if c == text_col else F.col(c))
        for c in carry_cols
    ]
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        words(text_col).alias("w"),
        *extra,
    )
    scored = base.select(
        "doc_id",
        fingerprint("text").alias("_fp"),
        F.size("w").alias("n_words"),
        quality_score_w(F.col("text"), F.col("w")).alias("quality"),
        lang_id_w(F.col("w")).alias("lang_pred"),
        *carry,
    )
    canonical = F.min("doc_id").over(Window.partitionBy("_fp"))
    lang_ok = (
        F.col("lang_pred").isin(*allowed_langs)
        if allowed_langs
        else F.col("lang_pred") != "und"
    )
    reason = (
        F.when(F.col("doc_id") != canonical, F.lit("duplicate"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~lang_ok, F.lit("lang"))
        .otherwise(F.lit(None).cast("string"))
    )
    return scored.select(
        "doc_id",
        "n_words",
        "quality",
        "lang_pred",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
        *carry_cols,
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling: a row survives iff the unit
    hash of its id falls below its stratum's fraction.

    This is the curation rebalance step (e.g. cap boilerplate-heavy domains,
    upweight rare languages) in a form that is exactly reproducible: the
    decision depends only on (id, salt), never on partitioning or an RNG
    stream, so re-runs, retries, and other engines (the SQL oracle) agree
    row-for-row.  Changing ``salt`` draws an independent sample."""
    frac = F.lit(float(default_fraction))
    for key, p in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == key, F.lit(float(p))).otherwise(frac)
    return df.filter(_unit_hash(F.col(id_col), salt) < frac)


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` TF-IDF terms per document: weight = tf · (ln((N+1)/(df+1)) + 1)
    (smoothed idf, always > 0 so ubiquitous terms still rank), with a
    (weight desc, token asc) total order for a deterministic cut.

    Shape: explode → (doc, token) count → token-keyed join against the
    document-frequency table → per-doc window top-k.  The df table is one row
    per vocabulary term — it shuffles on token alongside the tf table (a
    sort-merge join on the same key Catalyst already partitioned for the df
    aggregation), never a broadcast of something vocabulary-sized.  N is a
    scalar count, not a collected table."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("id", "token").agg(F.count("*").alias("tf"))
    # df is derived FROM tf — one (id, token) row per doc-term means
    # count(*) per token IS the distinct-doc count, so the second (and
    # bigger) pass over the raw exploded tokens with a count_distinct is
    # unnecessary
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    weighted = tf.join(dfreq, "token").select(
        "id",
        "token",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0)
        ).alias("weight"),
    )
    # Rank on the fixed-point quantized weight, not the raw double: ln is
    # not a correctly-rounded IEEE operation, so Java Math.log and another
    # engine's libm can differ by 1 ulp — enough to flip a near-tie rank
    # at the top-k cutoff (ADVICE r7).  Quantizing at 10⁻⁹ before the
    # window makes the ranking engine-invariant (the unigram_logprob
    # fixed-point-ln pattern); the raw weight still rides along as output.
    weighted = weighted.withColumn(
        "_wq", F.floor(F.col("weight") * 1e9 + F.lit(0.5)).cast("long")
    )
    w = Window.partitionBy("id").orderBy(F.col("_wq").desc(), F.col("token"))
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("id", "rank", "token", "tf", "df", "weight")
    )


def feature_hash_embeddings(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Feature-hashing text embeddings (the HashingTF / hashing-trick
    recipe): token t adds ±1 (sign = a second hash bit) into bucket
    h31(t) mod dim; bucket sums are L2-normalized (zero vector for empty
    docs) → (id, embedding array<double>).

    Bridges the text pipeline into the vector tiers with NO model: hashed
    embeddings feed kNN / near-dup / IVF directly, deterministically, so the
    SQL oracle reproduces them bit-for-bit.  Shape: one explode + one
    groupBy (the simhash pattern) — the token hash is computed ONCE per
    token instance; a per-row nested-loop formulation would re-evaluate it
    dim× per token (Catalyst has no CSE inside higher-order lambdas)."""
    from hnsw_spark.functions.hashing import h31
    from hnsw_spark.plans.parallelism import fan_out_narrow

    df = fan_out_narrow(df)
    # tokens_col: a pre-tokenized array (e.g. chunk_documents'
    # chunk_tokens) skips the words() regexp re-split — row-identical
    # because words() tokens are \s-free and lowercased, so
    # words(array_join(toks, ' ')) == toks up to the empty-token rows the
    # filter below drops either way
    toks = F.col(tokens_col) if tokens_col is not None else words(text_col)
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).filter(F.col("tok") != "")
    hashed = tok.withColumn("h", h31("tok")).select(
        "id",
        (F.col("h") % dim).alias("bucket"),
        F.when((F.col("h") % (2 * dim)) >= dim, F.lit(-1.0))
        .otherwise(F.lit(1.0))
        .alias("sign"),
    )
    sums = [
        F.sum(F.when(F.col("bucket") == i, F.col("sign")).otherwise(0.0)).alias(
            f"b{i}"
        )
        for i in range(dim)
    ]
    agg = hashed.groupBy("id").agg(*sums)
    raw = F.array(*[F.col(f"b{i}") for i in range(dim)])
    agg2 = agg.select("id", raw.alias("_raw"))
    norm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    agg3 = agg2.withColumn("_norm", norm)
    emb = F.when(F.col("_norm") == 0.0, F.col("_raw")).otherwise(
        F.transform("_raw", lambda x: x / F.col("_norm"))
    )
    return agg3.select("id", emb.alias("embedding"))


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram language model — the classic fluency/quality proxy (documents of
    rare-token soup score low, ordinary prose scores high).

    Per token occurrence, q = floor(ln(count(token)/total) · 10⁶ + 0.5) is an
    engine-invariant fixed-point BIGINT; per-doc score = Σ tf·q / Σ tf (exact
    integer arithmetic until the final division), so the oracle hash-matches
    at any partitioning.  Headroom: |q| ≤ ~5·10⁷ even at 10¹⁵ total tokens,
    so Σ tf·q stays far under the 9.2·10¹⁸ BIGINT cap for any real document.

    Shape: explode → (doc, token) tf → token-keyed count table derived FROM
    tf (never a second pass over raw occurrences) → join tf⋈counts on token
    (doc-vocab rows, not occurrences — the skew of 'the' is bounded by
    distinct docs, and AQE skew-join splits what remains) → one groupBy(doc).
    The corpus total is a 1-row aggregate cross-joined as a broadcast, never
    a driver collect.  Docs with no tokens keep a row (n_tokens=0, NULL
    logprob).

    tf feeds three consumers (cnt, the corpus total, and the scoring
    join); Spark does not CSE shared subtrees, so without the persist the
    explode + tf aggregate ran once PER consumer (the corpus tokenized
    twice through the cnt branch alone).  Same caller-owned lifetime as
    bigram_logprob's tf persist (README "Cache ownership").  The total is
    Σ tf read off the persisted frame — identical to Σ c by construction
    (both are exact integer sums of the same occurrences)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    tf = owned_persist(tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")))
    cnt = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tot = tf.agg(F.sum("tf").alias("t"))
    q = F.floor(
        F.log(F.col("c").cast("double") / F.col("t").cast("double")) * 1000000.0
        + 0.5
    )
    per = (
        tf.join(cnt, "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "tf", (F.col("tf") * q).alias("tfq"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"), F.sum("tfq").alias("sq")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            # raw: sq and n_tokens are exact integers, the one division is
            # IEEE-identical in every engine (oracle wrappers quantize)
            (
                F.col("sq").cast("double") / (F.col("n_tokens") * F.lit(1000000.0))
            ).alias("logprob"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    k: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    add-k-smoothed bigram LM: log P(wᵢ|wᵢ₋₁) = ln((c(wᵢ₋₁wᵢ) + k) /
    (c(wᵢ₋₁·) + k·V)) averaged over the document's bigram occurrences —
    the fluency tier above ``unigram_logprob`` (scrambled word-salad keeps
    its unigram score but collapses here, because the per-transition
    probabilities vanish).

    Engine-invariance recipe shared with unigram_logprob: per distinct
    (doc, bigram), q = floor(ln(p)·10⁶ + 0.5) is a fixed-point BIGINT; the
    per-doc score is Σ tf·q / Σ tf with exact integer accumulation, so the
    oracle hash-matches at any partitioning.

    Shape: one explode → (doc, bigram) tf; corpus bigram counts and context
    counts are both derived FROM tf (context = sum over bigrams sharing a
    first word — never a second pass over raw occurrences); V (vocabulary)
    and the join totals ride as broadcast 1-row aggregates.  Docs with <2
    words keep a row (n_bigrams=0, NULL logprob)."""
    from hnsw_spark.functions.text import shingles_w
    from hnsw_spark.plans.parallelism import fan_out_narrow

    # base feeds TWO subtrees — the bigram tf explode and the vocabulary
    # count — and Spark does not CSE shared subtrees, so without the
    # persist the regexp tokenize pass runs twice over the corpus.  Same
    # caller-owned lifetime as tf below (README "Cache ownership");
    # MEMORY_AND_DISK so the token arrays spill, never OOM.
    base = (
        fan_out_narrow(df)
        .select(F.col(id_col).alias("doc_id"), words(text_col).alias("w"))
        .transform(owned_persist)
    )
    bg = base.select(
        "doc_id", F.explode(shingles_w(F.col("w"), 2)).alias("bg")
    )
    # tf feeds three consumers (cbg, ctx via cbg, and the scoring join);
    # persist it so the bigram explode+aggregate runs once, the same
    # 3-scans→1 treatment the tfidf tier got (queries/text.py:610).
    # Cache lifetime is the caller's (README "Cache ownership").
    tf = owned_persist(bg.groupBy("doc_id", "bg").agg(F.count("*").alias("tf")))
    cbg = tf.groupBy("bg").agg(F.sum("tf").alias("c_bg"))
    ctx = (
        cbg.withColumn("ctx", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .groupBy("ctx")
        .agg(F.sum("c_bg").alias("c_ctx"))
    )
    # V = corpus vocabulary (distinct words, the smoothing denominator)
    vocab = (
        base.select(F.explode("w").alias("t"))
        .filter(F.col("t") != "")
        .agg(F.count_distinct("t").alias("v"))
    )
    q = F.floor(
        F.log(
            (F.col("c_bg") + F.lit(float(k)))
            / (F.col("c_ctx") + F.lit(float(k)) * F.col("v"))
        )
        * 1000000.0
        + 0.5
    )
    per = (
        tf.join(cbg, "bg")
        .withColumn("ctx", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(ctx, "ctx")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "tf", (F.col("tf") * q).alias("tfq"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"), F.sum("tfq").alias("sq")
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            (
                F.col("sq").cast("double")
                / (F.col("n_bigrams") * F.lit(1000000.0))
            ).alias("logprob"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line fraction,
    duplicate-word fraction, and the fraction of word 2-grams taken by the
    single most frequent 2-gram (boilerplate and degenerate loops spike all
    three; each is a standard drop rule in training-data curation).

    The line/word fractions are pure per-row expressions (pipelined in the
    scan's codegen span, zero shuffle).  The top-2-gram mode can't be a
    per-row expression without O(grams²) lambda work, so it takes the
    explode → groupBy(doc, gram) → groupBy(doc) max/sum shape: two shuffles
    with map-side partial aggregation, then one doc-keyed join back — the
    same scale discipline as vocab_stats.  Docs with <2 words have no grams
    and report 0.0."""
    from hnsw_spark.functions.text import shingles_w

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), "\n").alias("lines"),
        words(text_col).alias("w"),
    )
    grams = base.select(
        "doc_id", F.explode(shingles_w(F.col("w"), 2)).alias("g")
    )
    gc = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    ga = gc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c").cast("double")).alias("_tf")
    )
    dup = lambda a: F.when(  # noqa: E731
        F.size(a) == 0, F.lit(0.0)
    ).otherwise(1.0 - F.size(F.array_distinct(a)).cast("double") / F.size(a))
    return (
        base.join(ga, "doc_id", "left")
        .select(
            "doc_id",
            F.size("lines").alias("n_lines"),
            dup(F.col("lines")).alias("dup_line_frac"),
            dup(F.col("w")).alias("dup_word_frac"),
            F.coalesce("_tf", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )


def pipeline_attrition(
    df: DataFrame,
    max_top_2gram: float = 0.10,
    max_dup_word: float = 0.70,
    min_logprob: float = -3.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_quality: float = 0.5,
    allowed_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """The whole curation pipeline end-to-end, reported as an attrition
    table: every document flows through canonical-copy election, length,
    quality, and language gates (the curation_flags rules), then the
    repetition gates (repetition_stats) and the corpus-LM fluency floor
    (unigram_logprob), and the FIRST failing rule in that fixed priority
    order is its drop_reason ('kept' for survivors).  Output: one row per
    reason with n_docs and corpus share — the dashboard a training-data run
    publishes.

    Shape at scale: the corpus is scanned ONCE.  A single select computes
    every per-row signal (fingerprint, word/line arrays, quality, language,
    duplicate fractions) and is persisted (MEMORY_AND_DISK — spills, never
    OOMs); the canonical-copy window, the token-LM aggregation, and the
    2-gram-mode aggregation all read that materialized frame instead of
    re-deriving the tokenize pipeline per branch (the previous composition
    cost 8 parquet scans / 10 shuffles for one 5-row report).  Doc-keyed
    left joins reassemble the per-doc verdicts; the corpus total rides
    along as a broadcast 1-row aggregate, never a driver collect.  The
    cached blocks are released by Spark's ContextCleaner when the returned
    plan is garbage-collected."""
    from pyspark import StorageLevel

    from hnsw_spark.functions.text import shingles_w

    dup = lambda a: F.when(  # noqa: E731
        F.size(a) == 0, F.lit(0.0)
    ).otherwise(1.0 - F.size(F.array_distinct(a)).cast("double") / F.size(a))
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            words(text_col).alias("w"),
            F.split(F.col(text_col), "\n").alias("lines"),
        )
        .select(
            "doc_id",
            fingerprint("text").alias("_fp"),
            F.size("w").alias("n_words"),
            quality_score_w(F.col("text"), F.col("w")).alias("quality"),
            lang_id_w(F.col("w")).alias("lang_pred"),
            dup(F.col("lines")).alias("dup_line_frac"),
            dup(F.col("w")).alias("dup_word_frac"),
            "w",
        )
        .transform(owned_persist)
    )

    # flag tier: canonical-copy election + per-row gates (curation_flags
    # semantics, computed off the shared frame)
    canonical = F.min("doc_id").over(Window.partitionBy("_fp"))
    lang_ok = (
        F.col("lang_pred").isin(*allowed_langs)
        if allowed_langs
        else F.col("lang_pred") != "und"
    )
    flag_reason = (
        F.when(F.col("doc_id") != canonical, F.lit("duplicate"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~lang_ok, F.lit("lang"))
        .otherwise(F.lit(None).cast("string"))
    )
    flags = base.select(
        "doc_id", "dup_word_frac", flag_reason.alias("drop_reason")
    )

    # corpus-LM tier (unigram_logprob semantics: fixed-point ln, exact
    # integer accumulation, NULL logprob for token-free docs)
    tok = base.select("doc_id", F.explode("w").alias("token")).filter(
        F.col("token") != ""
    )
    # tf feeds three consumers (cnt, the corpus total, the scoring join) —
    # persisted so the explode + aggregate over every token occurrence runs
    # once, not once per consumer (same fix as unigram_logprob; lifetime is
    # ContextCleaner's, like ``base`` above).  tot = Σ tf ≡ Σ c exactly.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .transform(owned_persist)
    )
    cnt = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tot = tf.agg(F.sum("tf").alias("t"))
    q = F.floor(
        F.log(F.col("c").cast("double") / F.col("t").cast("double")) * 1000000.0
        + 0.5
    )
    lp = (
        tf.join(cnt, "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "tf", (F.col("tf") * q).alias("tfq"))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"), F.sum("tfq").alias("sq"))
        .select(
            "doc_id",
            (
                F.col("sq").cast("double")
                / (F.col("n_tokens") * F.lit(1000000.0))
            ).alias("logprob"),
        )
    )

    # repetition tier: top-2-gram mode share (repetition_stats semantics)
    ga = (
        base.select("doc_id", F.explode(shingles_w(F.col("w"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias("_tf")
        )
    )

    joined = (
        flags.join(lp, "doc_id", "left")
        .join(ga, "doc_id", "left")
        .select(
            "doc_id",
            "drop_reason",
            "dup_word_frac",
            "logprob",
            F.coalesce("_tf", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )
    reason = F.coalesce(
        F.col("drop_reason"),
        F.when(
            (F.col("top_2gram_frac") > max_top_2gram)
            | (F.col("dup_word_frac") > max_dup_word),
            F.lit("repetitive"),
        ),
        F.when(F.col("logprob") < min_logprob, F.lit("incoherent")),
        F.lit("kept"),
    )
    # the row count of ``joined`` IS the row count of ``base`` (flags is a
    # 1:1 select of base; lp and ga are groupBy(doc_id) frames left-joined
    # on the unique key, so neither join changes cardinality) — counting
    # the persisted base instead of the joined frame stops the broadcast
    # total subtree from re-running the whole LM + 2-gram join pipeline
    # just to count rows
    total = base.agg(F.count("*").alias("_total"))
    return (
        joined.select(reason.alias("drop_reason"))
        .groupBy("drop_reason")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "drop_reason",
            "n_docs",
            # raw exact ratio (oracle-facing callers quantize)
            (F.col("n_docs").cast("double") / F.col("_total")).alias("share"),
        )
    )


def quality_logit(text_col: str = "text") -> Column:
    """The fixed-weight linear quality score ``z`` as a reusable Column
    (exact-rational features, no transcendental functions) — the single
    definition behind ``quality_classifier`` and the calibration gate."""
    w = words(text_col)
    from hnsw_spark.functions.text import (
        avg_word_len_w,
        punct_ratio,
        stopword_ratio_w,
    )

    n_words = F.size(w).cast("double")
    nw_score = F.least(n_words / F.lit(200.0), F.lit(1.0))
    swr = stopword_ratio_w(w)
    awl = avg_word_len_w(w)
    awl_mid = F.when((awl >= 3) & (awl <= 10), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    punct = punct_ratio(F.col(text_col))
    return (
        F.lit(-1.2)
        + F.lit(1.5) * nw_score
        + F.lit(2.0) * swr
        + F.lit(0.8) * awl_mid
        - F.lit(3.0) * punct
    )


def quality_prob(text_col: str = "text") -> Column:
    """Rational-sigmoid probability ``0.5 + 0.5·z/(1+|z|)`` of the quality
    logit — algebraic (no libm), hence bit-identical across engines."""
    z = quality_logit(text_col)
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality scoring: a fixed-weight linear classifier over
    the interpretable text features (the FineWeb/C4 "quality classifier"
    tier, with published weights instead of a learned checkpoint — swap the
    constants for trained ones without touching the plan).

    Output: (doc_id, z, prob, keep_pred).  ``z`` is the linear score over
    exact-rational features (token counts and ratios — no transcendental
    functions), and ``prob`` maps it through the rational sigmoid
    ``0.5 + 0.5·z/(1+|z|)``: algebraic, monotone, [0,1], and — unlike
    ``exp`` — bit-identical across engines, so the oracle can pin every row
    (libm ``exp`` differs in the last ulp between JVM and C and would flip
    rounded boundaries).  Pure per-row Catalyst expressions: the classifier
    fuses into the scan stage, zero shuffles at any corpus size."""
    z = quality_logit(text_col)
    # the single sigmoid definition — calibration_bins scores via the same
    # quality_prob, so a recalibration edit cannot drift the two apart
    prob = quality_prob(text_col)
    return df.select(
        F.col(id_col),
        z.alias("z"),
        prob.alias("prob"),
        (prob >= F.lit(threshold)).alias("keep_pred"),
    )


def mixing_weights(
    df: DataFrame,
    by: str = "source",
    alpha: float = 0.7,
    target_rows: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled domain mixing weights: per group,
    ``weight ∝ n^alpha`` normalized over groups — the standard LLM recipe
    for flattening a skewed source distribution (alpha=1 keeps natural
    proportions; alpha→0 approaches uniform-per-domain).

    Output: (domain, n_docs, natural_share, weight[, sample_rate]) where
    ``sample_rate`` (when ``target_rows`` is given) is the per-document
    inclusion rate that realizes the mix at the target corpus size — values
    over 1.0 mean the domain must be up-sampled (epochs > 1), the signal a
    mixing dashboard watches for.

    One groupBy over the corpus; the normalization total rides as a
    broadcast 1-row aggregate over the (tiny, one-row-per-domain) counts."""
    counts = df.groupBy(F.col(by).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    powed = counts.withColumn(
        "_pow", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    totals = powed.agg(
        F.sum("_pow").alias("_pow_total"),
        F.sum("n_docs").alias("_n_total"),
    )
    out = powed.crossJoin(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        (F.col("n_docs") / F.col("_n_total")).alias("natural_share"),
        (F.col("_pow") / F.col("_pow_total")).alias("weight"),
        *(
            [
                (
                    (F.col("_pow") / F.col("_pow_total"))
                    * F.lit(float(target_rows))
                    / F.col("n_docs")
                ).alias("sample_rate")
            ]
            if target_rows is not None
            else []
        ),
    )
    return out


def apply_mixing(
    df: DataFrame,
    rates: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Materialize a domain mixture: each document is emitted
    ``floor(rate)`` times plus one more with probability ``frac(rate)`` —
    so ``rate`` is expected copies per doc (0.3 downsamples, 2.5 means 2
    epochs plus a 50% third).  Feed it the ``sample_rate`` column that
    ``mixing_weights(..., target_rows=...)`` computes to realize that mix.

    The fractional decision is the unit hash of (id, salt) — a pure row
    expression, so the materialization is deterministic across runs,
    engines, and partitionings (an epoch-boundary re-run reproduces the
    same corpus), and the whole operator is shuffle-free: copy expansion
    is a ``sequence``+``explode`` in the scan stage.  Output: the input
    rows with a ``copy`` index (1-based) — downstream packing/sharding
    hashes (id, copy) so copies spread across shards."""
    rate = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(by) == key, F.lit(float(r))).otherwise(rate)
    n = (
        F.floor(rate)
        + F.when(_unit_hash(F.col(id_col), salt) < rate - F.floor(rate), 1)
        .otherwise(0)
    ).cast("long")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n")))
        )
        .drop("_n")
    )


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the unit hash of (id, salt)
    falls into cumulative weight intervals ordered by split name — so the
    assignment is a pure row expression (scan-stage, zero shuffles),
    reproducible across runs/engines/partitionings, and STABLE UNDER
    APPENDS: a document's split never changes when the corpus grows, the
    property random-number splits lose and the one that prevents test-set
    leakage across re-curations.  Weights must sum to 1 (validated)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _unit_hash(F.col(id_col), salt)
    expr = F.lit(None).cast("string")
    cum = 0.0
    # iterate in reverse cumulative order so the first interval wins
    bounds = []
    for name, w in sorted(weights.items()):
        cum += w
        bounds.append((name, cum))
    for name, ub in reversed(bounds):
        expr = F.when(u < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def contrastive_pairs(
    df: DataFrame,
    k_negatives: int = 4,
    id_col: str = "doc_id",
    salt: str = "neg",
) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training:
    each document gets ``k_negatives`` pseudo-random OTHER documents —
    (anchor_id, j, negative_id), reproducible across runs/engines (the
    draw is pure hash arithmetic over the corpus's dense hash-shuffle
    positions, so an epoch re-run or a backfill regenerates the same
    pairs).

    Mechanics: every doc takes its ``global_shuffle`` position p (dense
    0..N−1); negative j sits at (p + 1 + ⌊u·(N−1)⌋) mod N where u is the
    unit hash of (id, salt, j) — the +1 forbids self-pairs.  u·(N−1)
    stays exact in doubles (numerator < 2⁵³), so the truncation is
    engine-invariant.

    Shape: the position frame computes once (two keyed shuffles, see
    global_shuffle); negatives expand as a scan-stage sequence+hash
    expression and resolve with ONE position-keyed join (negative side
    repartitions by target position; N rides as a broadcast 1-row
    aggregate).  No candidate ever materializes more than k·N rows."""
    from hnsw_spark.operators.packing import global_shuffle
    from hnsw_spark.plans.cachereg import owned_persist

    # the position frame has THREE consumers (the corpus-size aggregate,
    # the expanded anchors, and the negative-resolution join's right side)
    # and Spark does not CSE shared subtrees — without the persist the
    # two keyed global_shuffle shuffles ran once per consumer.  Skinny
    # (id + pos), library-owned (release_caches() frees it).
    pos = owned_persist(
        global_shuffle(df.select(id_col), id_col=id_col).select(
            F.col(id_col).alias("anchor_id"), F.col("pos")
        )
    )
    n = pos.agg(F.count(F.lit(1)).alias("_n"))
    expanded = (
        pos.crossJoin(F.broadcast(n))
        .select(
            "anchor_id",
            "pos",
            "_n",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(k_negatives)))
            ).alias("j"),
        )
        .select(
            "anchor_id",
            "j",
            (
                (
                    F.col("pos")
                    + 1
                    + F.floor(
                        _unit_hash(
                            F.concat(
                                F.col("anchor_id").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            ),
                            salt,
                        )
                        * (F.col("_n") - 1)
                    )
                )
                % F.col("_n")
            ).alias("_neg_pos"),
        )
    )
    return (
        expanded.join(
            pos.select(
                F.col("pos").alias("_neg_pos"),
                F.col("anchor_id").alias("negative_id"),
            ),
            "_neg_pos",
        )
        .select("anchor_id", "j", "negative_id")
    )


def vocab_stats(
    df: DataFrame,
    top_n: int | None = 100,
    min_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: per token, total occurrences (``tf``) and the
    number of documents containing it (``df``), ordered by (tf desc, token)
    with a deterministic tie-break, optionally truncated to ``top_n``.

    One explode + one shuffle on the token; ``df`` comes from
    ``count_distinct(doc_id)`` inside the same aggregation rather than a
    second pass.  The top-N cut is a TakeOrdered, not a full sort."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    agg = (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("id").alias("df"),
        )
        .filter(F.col("df") >= min_doc_freq)
    )
    ordered = agg.orderBy(F.col("tf").desc(), F.col("token"))
    return ordered.limit(top_n) if top_n is not None else ordered


def zipf_stats(
    df: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Rank-frequency (Zipf) profile of the corpus vocabulary: the top-N
    tokens with rank, frequency, corpus share, and cumulative head share —
    the standard tokenizer-design / vocabulary-truncation diagnostic (what
    fraction of the token stream does a V-word vocab cover?).

    Output: (rank INT, token, freq BIGINT, share, cum_share) ordered by
    rank.  ``cum_share`` accumulates in rank order, which is deterministic,
    so the floating sum is reproducible cross-engine.

    One explode + one token-keyed shuffle; the top-N cut is TakeOrdered
    (per-partition heads then merge — never a full sort of the vocabulary),
    and the total-token count joins back as a broadcast scalar.
    """
    tok = df.select(F.explode(words(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("freq"))
    total = freq.agg(F.sum("freq").alias("_total"))
    top = freq.orderBy(F.col("freq").desc(), F.col("token")).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("_sh", F.col("freq") / F.col("_total"))
        .select(
            "rank",
            "token",
            "freq",
            F.col("_sh").alias("share"),
            F.sum("_sh").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum_share"),
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws1",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir" — public
    knowledge): each row draws an exponential key ``-ln(u)/w`` from a pure
    hash of its id and the ``n`` smallest keys win, which selects each row
    with probability proportional to its weight.

    This is the curation step that upsamples high-value documents (long,
    high-quality, rare-language) into a fixed-size budget.  Determinism
    and scale come from the same two moves as ``stratified_sample``:

    - ``u`` is the md5 unit hash of (id, salt) — no RNG stream, so re-runs,
      retries, and the SQL oracle agree row-for-row, and a different
      ``salt`` draws an independent sample.
    - The key is quantized to 1e-12 fixed point BEFORE ordering and the
      (key_fp, id) pair is a total order, so the selection is insensitive
      to sub-quantum libm drift across engines; the raw key is never
      emitted.
    - The ``n``-row cut is ``orderBy(...).limit(n)`` — Spark plans
      TakeOrderedAndProject (per-partition top-``n`` heaps merged on the
      driver), never a global sort, so the plan is one scan at any scale.

    Returns DataFrame[sel_rank INT, <id_col>, weight BIGINT] in key order.
    """
    w = F.greatest(F.col(weight_col).cast("bigint"), F.lit(1))
    # u in (0, 1]: (h + 1) / 2^32 with h the 32-bit md5 prefix
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_HASH_SPACE)
    key_fp = F.floor(-F.ln(u) / w.cast("double") * F.lit(1e12) + F.lit(0.5)).cast(
        "bigint"
    )
    picked = (
        df.select(F.col(id_col), w.alias("weight"), key_fp.alias("_key"))
        .orderBy("_key", id_col)
        .limit(int(n))
    )
    rank_w = Window.orderBy("_key", id_col)
    return picked.select(
        F.row_number().over(rank_w).cast("int").alias("sel_rank"),
        id_col,
        "weight",
    )


def embedding_outliers(
    emb: DataFrame,
    k_sigma: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space outlier detection: flag vectors whose euclidean
    distance to their group centroid exceeds mean + ``k_sigma``·σ of the
    group's distance distribution — the standard first-pass screen for
    mislabeled / corrupted rows before embeddings feed contrastive
    training or ANN serving.

    Three passes, all skinny: (1) centroids via posexplode + per-(label,
    dim) fixed-point mean — the shuffle carries groups×dim partial
    aggregates, not vectors; (2) distances as one scan with the centroid
    table (groups×dim values) broadcast; (3) per-group mean/σ as a second
    partial-agg shuffle of two quantized sums, broadcast back for the
    flag.  Every aggregate uses the ``dsum`` fixed-point convention, so
    the threshold — and therefore the flagged set — is engine-invariant
    at any partitioning.

    Returns DataFrame[id_col, label_col, dist, threshold] for flagged
    rows (raw exact dist/threshold; oracle-facing callers quantize).
    """
    from hnsw_spark.functions.similarity import euclidean_distance
    from hnsw_spark.operators.evaluation import davg

    pos = emb.select(
        F.col(label_col), F.col(id_col), F.posexplode(vec_col).alias("pos", "v")
    )
    cent = pos.groupBy(label_col, "pos").agg(davg("v", 6).alias("c"))
    cent_arr = cent.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("_cent")
    )
    from pyspark.storagelevel import StorageLevel

    # the skinny (id, label, dist) frame feeds BOTH the moment aggregation
    # and the flag filter — persist it so the corpus is scanned once for
    # distances, not once per consumer
    d = (
        emb.join(F.broadcast(cent_arr), label_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            euclidean_distance(F.col(vec_col), F.col("_cent")).alias("_d"),
        )
        .transform(owned_persist)
    )
    stats = (
        d.groupBy(label_col)
        .agg(
            davg("_d", 6).alias("_mean"),
            davg(F.col("_d") * F.col("_d"), 6).alias("_m2"),
        )
        .withColumn(
            "_sd",
            F.sqrt(F.greatest(F.col("_m2") - F.col("_mean") * F.col("_mean"), F.lit(0.0))),
        )
    )
    thr = F.col("_mean") + F.lit(float(k_sigma)) * F.col("_sd")
    return (
        d.join(F.broadcast(stats), label_col)
        .filter(F.col("_d") > thr)
        .select(
            id_col,
            label_col,
            # raw exact values (oracle-facing callers quantize)
            F.col("_d").alias("dist"),
            thr.alias("threshold"),
        )
    )


def token_budget_select(
    docs: DataFrame,
    budget_fraction: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1000,
) -> DataFrame:
    """Quality-greedy corpus selection under a token budget: take documents
    in (quality DESC, id ASC) order while the running token total stays
    within ``budget_fraction`` of the corpus total — the "best N tokens"
    step that sizes a training mix.  Returns every document with
    DataFrame[(id, tokens, quality, selected)].

    Scale design: the textbook formulation is a GLOBAL sort + running sum —
    a total-order window that single-threads 100 TB through one task.
    Instead, selection-by-threshold in two cheap passes, still EXACT:

    1. bucket each doc by quantized quality (``floor(q·buckets)``, ≤ 1001
       keys) and aggregate per-bucket token totals — one partial-agg
       shuffle of ≤ 1001 skinny rows, collected to the driver (bounded);
    2. walk buckets best-first to find the boundary bucket where the
       cumulative total crosses the budget: better buckets are selected
       wholesale, worse rejected wholesale — no per-row ordering at all;
       only the boundary bucket (~1/buckets of the corpus) pays a window,
       ordered by (quality DESC, id), seeded with the better-buckets'
       running total.

    Exact because bucket order refines quality order (quality is already
    quantized to 1e-6 by ``quality_score``), and the in-bucket window
    reproduces the global greedy order within the one bucket where the
    cut falls.
    """
    from hnsw_spark.functions.text import quality_score_w, words

    base = docs.select(
        F.col(id_col),
        F.size(words(text_col)).cast("long").alias("tokens"),
        quality_score_w(F.col(text_col), words(text_col)).alias("quality"),
    ).withColumn(
        "_bucket", F.floor(F.col("quality") * n_buckets).cast("int")
    )
    from pyspark.storagelevel import StorageLevel

    base = owned_persist(base)

    # pass 1: <= n_buckets+1 rows to the driver (bounded by construction)
    totals = {
        r._bucket: r.t
        for r in base.groupBy("_bucket")
        .agg(F.sum("tokens").alias("t"))
        .collect()
    }
    grand_total = sum(totals.values())
    budget = int(grand_total * budget_fraction)

    cum = 0
    boundary, prefix = None, 0
    for b in sorted(totals, reverse=True):
        if cum + totals[b] > budget:
            boundary, prefix = b, cum
            break
        cum += totals[b]
    if boundary is None:
        # the whole corpus fits: everything is selected
        return base.select(
            id_col, "tokens", "quality", F.lit(True).alias("selected")
        )

    # pass 2: window over ONLY the boundary bucket's rows (the filters cut
    # the other buckets before the exchange), seeded with the
    # already-accepted prefix total
    cols = [id_col, "tokens", "quality"]
    sel_hi = base.filter(F.col("_bucket") > boundary).select(
        *cols, F.lit(True).alias("selected")
    )
    sel_lo = base.filter(F.col("_bucket") < boundary).select(
        *cols, F.lit(False).alias("selected")
    )
    bw = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.desc("quality"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bnd = base.filter(F.col("_bucket") == boundary).select(
        *cols,
        ((F.sum("tokens").over(bw) + F.lit(prefix)) <= F.lit(budget)).alias(
            "selected"
        ),
    )
    return sel_hi.unionByName(bnd).unionByName(sel_lo)


def dsir_select(
    docs: DataFrame,
    target_col: str = "source",
    target_value: str = "src0",
    n_buckets: int = 256,
    smoothing: float = 1.0,
    keep_frac: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection via hashed-n-gram importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — public method; no reference counterpart).

    Fits two add-k-smoothed bag-of-hashed-unigrams models — the TARGET
    distribution p (documents where ``target_col == target_value``) and the
    RAW distribution q (the whole corpus) — over ``n_buckets`` md5 hash
    buckets, then scores every document by its mean per-token importance
    log-ratio  Σ tf·(ln p̂(b) − ln q̂(b)) / Σ tf  and keeps the top
    ``keep_frac`` by score (deterministic ranking variant of DSIR's
    Gumbel resampling: ties at the cut threshold are all kept, so the
    survivor set is engine-reproducible).

    Engine-invariance recipe shared with ``unigram_logprob``: each bucket's
    ln-probability is quantized to a fixed-point BIGINT (floor(ln·10⁶+0.5))
    BEFORE the subtraction, per-doc accumulation is exact integer Σ tf·λ,
    and the cut threshold is the floor-index percentile of the resulting
    scores — every comparison both engines make is over identical doubles.

    Scale shape: one tokenize/explode pass → (doc, bucket) tf; both bucket
    tables are ≤ n_buckets rows derived FROM tf (never a second corpus
    pass) and ride as one broadcast join; the threshold is one 1-row
    aggregate over the floor-index window (per-group sort over N skinny
    score rows — no corpus-width global sort).  Docs with zero tokens keep
    a row (n_tokens=0, NULL score, selected=false).
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(target_col) == target_value).alias("_tgt"),
        F.explode(words(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    from hnsw_spark.plans.cachereg import owned_persist

    # tfb feeds THREE consumers (raw counts, target counts, per-doc scores)
    # and per feeds two (threshold + final projection): without the persists
    # the whole tokenize/explode pipeline re-runs per consumer — audited at
    # 6 corpus scans / 15 shuffles, the corpus_attrition anti-pattern.
    # cachereg-owned (a bare .persist() has no release handle and leaks
    # storage across a long-lived session — the quality_auc lesson).
    tfb = owned_persist(
        tok.groupBy("doc_id", "_tgt", bucket.alias("bucket"))
        .agg(F.count("*").alias("tf"))
    )
    cr = tfb.groupBy("bucket").agg(F.sum("tf").alias("c_raw"))
    ct = tfb.filter("_tgt").groupBy("bucket").agg(F.sum("tf").alias("c_tgt"))
    tot = (
        cr.agg(F.sum("c_raw").alias("r"))
        .crossJoin(ct.agg(F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("t")))
    )
    k, b = float(smoothing), float(n_buckets)

    def _q(num, den):
        return F.floor(F.log(num / den) * 1000000.0 + 0.5).cast("long")

    lam = (
        cr.join(ct, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                _q(F.coalesce("c_tgt", F.lit(0)) + F.lit(k), F.col("t") + F.lit(k * b))
                - _q(F.col("c_raw") + F.lit(k), F.col("r") + F.lit(k * b))
            ).alias("lam"),
        )
    )
    per = (
        tfb.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lam")).alias("_si"),
        )
        .withColumn(
            "_score", F.col("_si") / (F.col("n_tokens") * F.lit(1000000.0))
        )
    )
    per = owned_persist(per)
    from hnsw_spark.operators.evaluation import percentile_floor

    thr = percentile_floor(per, "_score", [100.0 * (1.0 - keep_frac)])
    thr_col = thr.columns[0]
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            # exact fixed-point mean λ (1e-6 nats): si/(n·10⁶) routinely
            # lands ON a 6-decimal half boundary (si, n are small ints), so
            # a round() would be engine-dependent — floor(si/n) of the exact
            # integer quotient never is (the rational is ≥ 1/n away from
            # any other integer, dwarfing the double division's half-ulp)
            F.floor(F.col("_si") / F.col("n_tokens"))
            .cast("long")
            .alias("score_fp"),
            F.coalesce(
                F.col("_score") >= F.col(thr_col), F.lit(False)
            ).alias("selected"),
        )
    )
