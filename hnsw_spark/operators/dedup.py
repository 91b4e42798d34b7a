"""Deduplication operators for large-scale training-data pipelines.

Five tiers, cheapest-first — the standard corpus-dedup ladder:

1. exact (md5 fingerprint groupBy)            — ``exact_dedup``
2. n-gram Jaccard via shingle equi-join        — ``ngram_jaccard_pairs``
3. MinHash signatures + banded LSH             — ``minhash_signatures`` /
                                                 ``lsh_candidate_pairs``
4. SimHash bit-fingerprints                    — ``simhash``
5. embedding-cosine near-dup                   — ``embedding_neardup``

Scale design: everything is shuffle-on-key (fingerprint / shingle / band
bucket), never an all-pairs crossJoin; candidate generation is linear in
corpus size and pair verification touches only co-bucketed rows.  Hashes are
md5-derived (functions.hashing) so results are engine-reproducible; minhash
permutations use seeded coefficients shared with the SQL oracle generator.
At 100 TB the only hot spot is degenerate buckets (a shingle/band shared by
millions of docs); ``max_bucket`` caps those (the standard mitigation), and
AQE skew-join handles moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hnsw_spark.functions.hashing import P31, h31, md5_bigint, minhash_perms, perm_hash
from hnsw_spark.functions.similarity import dot_product, l2_norm
from hnsw_spark.functions.text import fingerprint, shingles, shingles_w, words


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: (fingerprint, canonical_id =
    min id, n_copies).  Map-side partial agg → one shuffle on fingerprint."""
    return (
        df.select(F.col(id_col).alias("_id"), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def incremental_dedup(
    new_df: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingest dedup: from a NEW batch of documents, keep only
    the canonical copy (lowest id) of each normalized-text fingerprint that
    is NOT already in the ingested corpus — the daily-crawl append step of a
    continuously-curated corpus.  ``seen_fingerprints`` needs one column,
    ``fingerprint`` (e.g. ``exact_dedup(corpus).select("fingerprint")``).

    Output: the surviving new rows plus their ``fingerprint`` (append it to
    the seen set for the next increment).

    Scale shape: within-batch canonical election is one window over the
    fingerprint (shuffle sized by the BATCH, not the corpus); the seen-set
    check is a left-anti join on the same key — Catalyst keeps the
    fingerprint partitioning from the window, and AQE broadcasts the batch
    side when a day's increment is small relative to the seen table.  The
    corpus itself is never re-scanned: only its fingerprint set (16 bytes a
    row) participates."""
    fp = new_df.withColumn("fingerprint", fingerprint(text_col))
    canon = F.min(id_col).over(Window.partitionBy("fingerprint"))
    batch_canonical = fp.withColumn("_canon", canon).filter(
        F.col(id_col) == F.col("_canon")
    )
    return batch_canonical.join(
        seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
    ).drop("_canon")


def doc_shingles(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation for Jaccard.
    Tokenizes into a bound column first (see shingles_w performance note).

    Dedup happens per ROW (``array_distinct`` on the shingle array before
    the explode), not with a post-explode ``.distinct()``: a shingle can
    only repeat WITHIN a document, so the per-row form is equivalent and
    removes an entire corpus-wide shuffle from every Jaccard-tier operator
    built on this frame — the set representation comes straight off the
    scan stage."""
    return doc_shingles_sized(df, n, text_col, id_col).drop("size")


def doc_shingles_sized(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle, size) rows where ``size`` = |distinct shingle set| of
    the document, carried on every row.  Because the distinct set is
    materialized as a per-row array first, the set SIZE is free
    (``F.size``) — callers that need per-doc set sizes (Jaccard's |A|, |B|)
    can aggregate them through the pair groupBy instead of joining a
    separately-shuffled sizes table.

    Parallelism guard: with no post-explode ``.distinct()`` there is no
    exchange between the file scan and the (expensive) shingle join built
    on this frame, so a single small input file would bound the whole join
    stage at the SCAN's split count (measured 3× wall on the sf0.1
    fixture, which is one parquet file → one task).  When the input plan
    is narrow and under-split, the RAW doc rows are round-robined up to
    core count first — shuffling documents is strictly cheaper than the
    old distinct()'s shuffle of their exploded shingles, and at 100 TB the
    scan already carries thousands of splits so the branch never fires."""
    from hnsw_spark.functions.text import shingles_w, words
    from hnsw_spark.plans.parallelism import fan_out_narrow

    df = fan_out_narrow(df)
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_w(words(text_col), n)).alias("_sh"),
    )
    return base.select(
        "id", F.explode("_sh").alias("shingle"), F.size("_sh").alias("size")
    )


def ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame | None = None,
    n: int = 2,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    share_shingles: bool = True,
) -> DataFrame:
    """Pairwise n-gram Jaccard via shingle equi-join:
    |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.

    The join key is the shingle, so cost is Σ bucket² over shingle buckets,
    not corpus² — the distributable formulation of pairwise Jaccard.  When
    ``left`` is a distinct (usually filtered, small) frame, its shingle table
    is broadcast so the corpus-side shingles never shuffle; asymmetric
    probe-vs-corpus comparison is the common shape at scale.  Asymmetric
    output is orientation-free: each (probe, corpus) match is emitted once as
    (id_a, id_b) = (min, max) — comparing only ``probe.id < corpus.id`` would
    silently skip corpus docs with smaller ids.  Asymmetric mode assumes an
    id names the same document on both sides (the probe frame is a filter of
    the corpus, the common case).

    ``max_doc_freq`` is the anti-quadratic guard (the analogue of LSH's
    ``max_bucket``): shingles appearing in more than that many corpus docs —
    stop-phrases shared by millions of documents at 100 TB, whose bucket²
    join cost is the one blowup this formulation has — are dropped from the
    set representation entirely (both |A∩B| and |A|, so Jaccard stays
    internally consistent).  The default is None (exact Jaccard): the cap
    changes reported values, so scale callers must opt IN to the
    approximation at the call site rather than getting it silently
    (ADVICE r2).  The banned set is at most
    (total shingle instances / max_doc_freq) rows, so it broadcasts, and the
    filter is a broadcast anti-join — no extra shuffle on the corpus side.

    Plan shape (exact path): set sizes ride ON the shingle rows
    (``doc_shingles_sized`` — the size is free once the distinct set is a
    per-row array), so |A| and |B| flow through the pair groupBy as
    ``F.first`` aggregates instead of joining two separately-shuffled
    sizes tables: one equi-join + one groupBy total.  When ``threshold``
    > 0 the PPJoin length filter (Xiao et al., WWW'08 — J(A,B) ≥ t ⟹
    t·max(|A|,|B|) ≤ min(|A|,|B|)) is applied INSIDE the join condition,
    pruning size-incompatible pairs before they reach the pair-count
    shuffle.  With ``max_doc_freq`` set the banning anti-join changes the
    effective set sizes, so that path recounts sizes post-ban (the extra
    aggregates are the price of the approximation)."""
    asymmetric = right is not None and right is not left
    right = right if right is not None else left
    if asymmetric or not share_shingles:
        # ``share_shingles=False``: for an input BOUNDED BY CONSTRUCTION
        # (e.g. duplicate_span_lengths' fixed 150-doc window) the cache
        # materialization barrier costs more than re-deriving the tiny
        # shingle table inline on both pipelined join sides — at any
        # corpus scale, since the bound is the query's own definition.
        # Corpus-scale symmetric calls keep the default (share).
        sa = doc_shingles_sized(left, n, text_col, id_col)
        sb = doc_shingles_sized(right, n, text_col, id_col)
    else:
        # self-join: both join sides consume the SAME shingle pipeline,
        # and Spark does not CSE shared subtrees (when one side
        # broadcasts there is not even an exchange to reuse), so the
        # tokenize+shingle scan ran twice.  Library-owned persist — the
        # same treatment containment_pairs / jaccard_prefix_pairs got
        # (plans/cachereg.py docstring); released by the caller's
        # harness after the action.
        from hnsw_spark.plans.cachereg import owned_persist

        sa = sb = owned_persist(doc_shingles_sized(left, n, text_col, id_col))
    if max_doc_freq is not None:
        banned = (
            sb.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
        )

        # sizes change once shingles are banned: recount per doc and
        # re-attach to the rows (window over the post-ban frame keeps the
        # size-on-row contract without a separate sizes join downstream)
        def _ban(s: DataFrame) -> DataFrame:
            return (
                s.drop("size")
                .join(F.broadcast(banned), "shingle", "left_anti")
                .withColumn(
                    "size", F.count("*").over(Window.partitionBy("id"))
                )
            )

        if sa is sb:
            # one post-ban derivation for both sides of the shared table
            sa = sb = _ban(sa)
        else:
            sa, sb = _ban(sa), _ban(sb)
    pair_cond = F.col("a.shingle") == F.col("b.shingle")
    if asymmetric:
        probe = F.broadcast(sa)
        pair_cond = pair_cond & (F.col("a.id") != F.col("b.id"))
    else:
        probe = sa
        pair_cond = pair_cond & (F.col("a.id") < F.col("b.id"))
    if threshold > 0.0:
        pair_cond = pair_cond & (
            F.least(F.col("a.size"), F.col("b.size"))
            >= threshold * F.greatest(F.col("a.size"), F.col("b.size"))
        )
    sized = (
        probe.alias("a")
        .join(sb.alias("b"), pair_cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count("*").alias("n_common"),
            F.first(F.col("a.size")).alias("size_a"),
            F.first(F.col("b.size")).alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if not asymmetric:
        return sized.select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")
    # reorder to (min, max) and drop the duplicate orientation that arises
    # when both endpoints are probe docs present on the corpus side
    lo = F.col("id_a") < F.col("id_b")
    return sized.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        "n_common",
        F.when(lo, F.col("size_a")).otherwise(F.col("size_b")).alias("size_a"),
        F.when(lo, F.col("size_b")).otherwise(F.col("size_a")).alias("size_b"),
        "jaccard",
    ).dropDuplicates(["id_a", "id_b"])


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per doc: m0..m{num_perm-1} columns, each
    min((aᵢ·h31(shingle) + bᵢ) mod P31) over the doc's shingle set.

    min() is duplicate-insensitive, so no distinct is needed before the agg;
    one explode + one shuffle on doc id — and the shuffle moves ONE ROW PER
    DOC, not per shingle: hash-based partial aggregation collapses each
    doc's exploded shingles map-side (they are co-partitioned with their
    doc by construction), so the wire cost is n·num_perm longs.

    Shape adjudicated by measurement (round 11): the zero-shuffle twin —
    ``array_min(transform(shingle_hashes, h -> (a·h+b) mod P))`` per
    permutation, a pure map — is pair-identical but 1.5-2.6× SLOWER wall
    (2.46 vs 1.69 s at 50k docs, 12.8 vs 4.8 s at 1M on 32 cores):
    higher-order functions evaluate interpreted, outside codegen, and the
    explode plan's whole-stage-codegen'd hash+min beats the saved (already
    doc-sized) shuffle at every scale measured.  Revisit only if Catalyst
    ever codegens lambda functions."""
    from hnsw_spark.functions.text import shingles_w, words

    perms = minhash_perms(num_perm, seed)
    base = df.select(F.col(id_col).alias("id"), words(text_col).alias("_w"))
    sh = base.select(
        "id", F.explode(shingles_w(F.col("_w"), n)).alias("shingle")
    ).withColumn("h", h31("shingle"))
    return sh.groupBy("id").agg(
        *[F.min(perm_hash(F.col("h"), a, b)).alias(f"m{i}") for i, (a, b) in enumerate(perms)]
    )


def lsh_band_buckets(
    df: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(id, band_idx, band_key) bucket rows for banded MinHash-LSH — the
    shared representation behind the self-join (``lsh_candidate_pairs``)
    and the incremental new-batch-vs-corpus join
    (``lsh_incremental_candidates``).  At 100 TB this frame is what a
    pipeline PERSISTS (partitioned by band_key prefix): signatures are
    computed once per document ever, and each arriving batch joins its own
    buckets against the stored corpus buckets."""
    rows = num_perm // bands
    sig = minhash_signatures(df, num_perm, n, text_col, id_col, seed)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"m{bi * rows + j}") for j in range(rows)]
                    )
                ).alias("band_key"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_structs).alias("b")).select(
        "id", "b.band_idx", "b.band_key"
    )
    if max_bucket is not None:
        counts = buckets.groupBy("band_idx", "band_key").agg(
            F.count("*").alias("_n")
        )
        buckets = buckets.join(
            counts.filter(F.col("_n") <= max_bucket), ["band_idx", "band_key"]
        ).drop("_n")
    return buckets


def lsh_incremental_candidates(
    new_df: DataFrame,
    corpus_df: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Incremental near-dup candidates: each NEW document against the seen
    CORPUS only (never new×new, never corpus×corpus) → (new_id, corpus_id,
    n_bands).  The batch twin of continuous corpus dedup
    (``streaming/dedup.py``): per micro-batch, signatures are computed for
    the arriving docs only, and the join side that scales with corpus size
    is an equi-join on (band_idx, band_key) — shuffle bounded by batch
    bucket rows, corpus side pre-bucketed/persisted in production.

    ``max_bucket`` caps the CORPUS bucket width (degenerate-bucket guard);
    the new side is batch-sized and never capped, so a new doc cannot be
    silently skipped."""
    new_b = lsh_band_buckets(
        new_df, num_perm, bands, n, text_col, id_col, seed, max_bucket=None
    )
    corp_b = lsh_band_buckets(
        corpus_df, num_perm, bands, n, text_col, id_col, seed, max_bucket
    )
    return (
        new_b.alias("a")
        .join(
            corp_b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .groupBy(
            F.col("a.id").alias("new_id"), F.col("b.id").alias("corpus_id")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing ≥1 identical band.

    Signature split into ``bands`` bands of ``num_perm/bands`` rows; band key
    = md5 of the concatenated band values; self-join per (band_idx, key)
    bucket → distinct (id_a < id_b) pairs with the count of matching bands.
    ``max_bucket`` drops degenerate buckets (anti-quadratic guard at scale)."""
    buckets = lsh_band_buckets(
        df, num_perm, bands, n, text_col, id_col, seed, max_bucket
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash fingerprint over the word multiset: bit j of the output is 1
    iff Σ_tokens (±1 by bit j of h31(token)) ≥ 0.  One explode + one shuffle."""
    from hnsw_spark.functions.text import words

    tok = df.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("tok")
    ).withColumn("h", h31("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    summed = tok.groupBy("id").agg(*bit_sums)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return summed.select("id", sim.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 1000,
) -> DataFrame:
    """SimHash near-dup pairs (id_a < id_b, hamming ≤ ``max_hamming``) via
    hamming-distance banding.

    The fingerprint is split into ``bands`` contiguous bit chunks; by
    pigeonhole, any pair within hamming distance < ``bands`` shares at least
    one chunk verbatim, so candidate generation is a bucketed equi-join on
    (band_idx, chunk value) — Σ bucket² cost, never corpus² — and, unlike
    probabilistic LSH, it is EXACT for ``max_hamming < bands`` (every
    qualifying pair is guaranteed a shared band).  The exact hamming filter
    (``bit_count(a ⊕ b)``) then prunes candidates.  ``max_bucket`` drops
    degenerate chunk buckets, the same anti-quadratic guard as the LSH tier;
    at the default 16-bit/4-band geometry a band has only 16 distinct values,
    so real corpora need a wider ``bits`` or a cap that reflects the expected
    corpus/2⁴ occupancy."""
    if not 0 < bands <= bits:
        raise ValueError(f"bands must be in 1..{bits}, got {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"exactness requires max_hamming < bands, got {max_hamming} >= {bands}"
        )
    width = bits // bands
    fp = simhash(df, bits, text_col, id_col)
    chunks = []
    for bi in range(bands):
        lo = bi * width
        w = bits - lo if bi == bands - 1 else width  # last band takes remainder
        chunks.append(
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.shiftright(F.col("simhash"), lo)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("band_key"),
            )
        )
    buckets = fp.select(
        "id", "simhash", F.explode(F.array(*chunks)).alias("b")
    ).select("id", "simhash", "b.band_idx", "b.band_key")
    if max_bucket is not None:
        counts = buckets.groupBy("band_idx", "band_key").agg(F.count("*").alias("_n"))
        buckets = buckets.join(
            counts.filter(F.col("_n") <= max_bucket), ["band_idx", "band_key"]
        ).drop("_n")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # a pair sharing several bands appears once per shared band with the
        # same hamming; dedupe the (small) post-filter survivor set
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_neardup(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    brute_max: int = 20_000,
    **ivf_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ).

    ``strategy='brute'`` is the exact all-pairs tier — O(n²) scoring, only
    sane for small frames (the oracle/verification path).  ``'ivf'`` routes
    through ``operators.ann.ivf_self_join`` (assign each vector to its
    n_probe nearest inverted lists once, self-join within list only), the
    bucketed shape that survives 100 TB.  ``'auto'`` (default) picks brute
    below ``brute_max`` rows via a cheap limit-probe and IVF above it, so the
    all-pairs plan can never be reached at scale."""
    if strategy == "auto":
        head = df.select(id_col).limit(brute_max + 1).count()
        strategy = "brute" if head <= brute_max else "ivf"
    if strategy == "ivf":
        from hnsw_spark.operators.ann import ivf_self_join

        return ivf_self_join(
            df, threshold, id_col=id_col, vec_col=vec_col, **ivf_kwargs
        )
    if strategy != "brute":
        raise ValueError(f"unknown strategy: {strategy!r}")
    # Spark orders NaN above every double, so `cosine >= τ` alone would KEEP
    # zero-norm pairs (cosine = NaN per the reference's 0/0) that the IVF
    # BLAS path and the SQL oracle (0/0 → NULL) both drop.  A zero-norm
    # vector is a near-duplicate of nothing: drop those ROWS before the join
    # (n row-norms, not a post-join NaN re-check — Catalyst has no CSE, so
    # `isnan(cosine) & cosine >= τ` would evaluate the full kernel twice per
    # n² pair, measured 2× on the bench cell).
    nonzero = (
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
        > 0.0
    )
    # Norms are precomputed per ROW (n sqrt-of-dot kernels), not per pair:
    # the pair kernel is then one dot + one divide, 3× less higher-order-
    # function work across the n² stage.  Bitwise-identical to the per-pair
    # form — sqrt(dot(a,a)) is the same double either way, so oracle parity
    # is unaffected.  The left side is repartitioned (a filtered small frame
    # otherwise collapses to one input split → one nested-loop task) and the
    # right side broadcast, so the quadratic stage fans out across the
    # cluster instead of serializing.
    nz = df.filter(nonzero)
    a = nz.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        l2_norm(vec_col).alias("_na"),
    ).repartition(F.col("id_a"))
    b = F.broadcast(
        nz.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("_vb"),
            l2_norm(vec_col).alias("_nb"),
        )
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", dot_product("_va", "_vb") / (F.col("_na") * F.col("_nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def boilerplate_spans(
    df: DataFrame,
    n: int = 4,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate detection (the span-level cousin of
    CCNet/RefinedWeb repeated-line removal, adapted to span n-grams because
    the corpus has no line structure): an n-gram occurring in >= ``min_docs``
    DISTINCT documents is boilerplate, and every token it covers is a
    boilerplate token.

    Output: (doc_id, n_common, covered_tokens, boilerplate_ratio) — the
    per-document count of boilerplate shingle positions, the number of
    distinct token positions covered by at least one such shingle, and
    covered/len ratio.  Downstream, ``boilerplate_ratio`` feeds the quality
    gates exactly like ``repetition_stats`` (within-doc) does; this is the
    across-doc complement.

    Scale shape: one shuffle aggregates shingle->distinct-doc counts; the
    surviving boilerplate vocabulary is tiny by construction (it must repeat
    across documents), so it broadcasts back onto the position-exploded scan
    — the corpus itself is shuffled only once more, on doc_id, to count
    covered positions.  No all-pairs joins anywhere.
    """
    from hnsw_spark.plans.parallelism import fan_out_narrow

    w = words(text_col)
    docs = fan_out_narrow(df).select(
        F.col(id_col).cast("long").alias(id_col), w.alias("_w")
    )
    pos = docs.select(
        id_col,
        F.posexplode(shingles_w(F.col("_w"), n)).alias("pos", "shingle"),
    )
    common = (
        pos.groupBy("shingle")
        .agg(F.count_distinct(id_col).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("shingle")
    )
    hits = pos.join(F.broadcast(common), "shingle")
    # ONE aggregation over hits: n_common is the row count, and
    # covered_tokens — the size of the union of the [pos, pos+n-1]
    # intervals — has a closed form over the doc's SORTED distinct
    # positions (Σ min(next−cur, n), last interval contributing n), so
    # the old explode(sequence)+distinct pass (n× the hit rows through an
    # extra shuffle, plus a second evaluation of the whole scan+explode
    # pipeline for the separate n_common aggregate) collapses into the
    # same groupBy.  A doc's positions fit in one row by definition (the
    # doc itself was a row), so collect_set is bounded by doc length.
    pos_arr = F.array_sort(F.collect_set("pos"))
    per_doc = hits.groupBy(id_col).agg(
        F.count("*").alias("n_common"), pos_arr.alias("_ps")
    )
    gaps = F.zip_with(
        F.col("_ps"),
        F.slice(F.col("_ps"), 2, F.greatest(F.size("_ps") - 1, F.lit(1))),
        lambda a, b: F.coalesce(F.least(b - a, F.lit(n)), F.lit(n)),
    )
    per_doc = per_doc.select(
        id_col,
        "n_common",
        F.aggregate(
            gaps, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("covered_tokens"),
    )
    return (
        docs.select(id_col, F.size("_w").alias("_len"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", F.lit(0)).cast("double")
                / F.col("_len")
            ).alias("boilerplate_ratio"),
        )
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    n: int = 2,
    threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard self-join via PREFIX FILTERING (Bayardo et al.
    "Scaling Up All Pairs Similarity Search", WWW 2007; PPJoin family —
    public methods): identical output to ``ngram_jaccard_pairs`` at the
    same threshold, with candidate generation that joins only each set's
    rarest-token PREFIX instead of every shingle.

    Why it scales: two sets with Jaccard ≥ t must share a token within
    their first L − ⌈t·L⌉ + 1 tokens under ANY agreed global order — order
    by ascending document frequency (ties by token) and the join keys
    become the corpus's RAREST shingles, so the Σ bucket² blowup of the
    full shingle join (stop-phrase buckets at 100 TB) collapses to the
    near-singleton tail of the frequency distribution; the length filter
    (min(L) ≥ t·max(L)) prunes candidates before verification, and only
    surviving candidate PAIRS are verified with the exact intersection
    join.  Higher thresholds shrink the prefix — at t=0 this degenerates
    to the full join, so the operator targets the near-dup regime.

    DataFrame[(id_a, id_b, n_common, size_a, size_b, jaccard)] with
    id_a < id_b, exactly ``ngram_jaccard_pairs(df, n, threshold)``.

    Verification shape (round 9): candidate PAIRS join the per-doc distinct
    shingle ARRAY table on id and intersect columnar-side
    (``array_intersect``), instead of re-exploding both sides into a
    pair×shingle join + count aggregate — that cuts the old verification's
    three shuffles (two shingle joins + the pair groupBy) to two id-keyed
    joins with no aggregate, and the joined row count collapses from
    Σ pair-shingles to #candidates.  At 100 TB the candidate table is the
    small side by construction (the prefix filter exists to make it so),
    so the verification joins shuffle candidates, never the corpus.
    """
    from hnsw_spark.functions.text import shingles_w, words
    from hnsw_spark.plans.cachereg import owned_persist
    from hnsw_spark.plans.parallelism import fan_out_narrow

    # per-doc distinct shingle arrays: the single scan-side representation
    # every stage below derives from (library-owned persist: released by
    # hnsw_spark.release_caches())
    arrays = owned_persist(
        fan_out_narrow(df)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(shingles_w(words(text_col), n)).alias("_sh"),
        )
        .withColumn("size", F.size("_sh"))
    )
    sh = arrays.select("id", "size", F.explode("_sh").alias("shingle"))
    # document frequency as a window count over the shingle partitioning
    # (one pass, one shuffle) instead of a groupBy + join-back, which
    # evaluated the exploded frame twice and shuffled it twice; the
    # prefix itself is persisted because the candidate join consumes it
    # from BOTH sides (the two window shuffles would otherwise run twice).
    w = Window.partitionBy("id").orderBy(F.asc("_df"), F.asc("shingle"))
    prefix = owned_persist(
        sh.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            F.col("_rn")
            <= F.col("size") - F.ceil(F.lit(threshold) * F.col("size")) + 1
        )
        .select("id", "shingle", "size")
    )
    a = prefix.select(
        F.col("id").alias("id_a"),
        "shingle",
        F.col("size").alias("size_a"),
    )
    b = prefix.select(
        F.col("id").alias("id_b"),
        "shingle",
        F.col("size").alias("size_b"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("size_a", "size_b")
            >= F.lit(threshold) * F.greatest("size_a", "size_b")
        )
        .select("id_a", "id_b", "size_a", "size_b")
        .distinct()
    )
    inter = (
        cand.join(
            arrays.select(F.col("id").alias("id_a"), F.col("_sh").alias("_sha")),
            "id_a",
        )
        .join(
            arrays.select(F.col("id").alias("id_b"), F.col("_sh").alias("_shb")),
            "id_b",
        )
        .withColumn(
            "n_common",
            F.size(F.array_intersect("_sha", "_shb")).cast("long"),
        )
    )
    return inter.withColumn(
        "jaccard",
        F.col("n_common")
        / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
    ).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "size_a", "size_b", "jaccard"
    )


# Crossover chooser for the exact-Jaccard plans (VERDICT r9 #4 — the ANN
# tier's dispatch="auto" move applied to the dedup ladder).  The measured
# crossover (BENCH_PROTOCOL jaccard_crossover_recorded): the brute shingle
# equi-join wins on even corpora through 400k docs (trigram df is a product
# of word probabilities — near-singleton buckets), while BOILERPLATE
# (template runs shared verbatim by n/templates docs) explodes its pair
# aggregation quadratically and the df-ordered prefix plan wins 6.5×
# pair-for-pair-exact.  The signal is the brute plan's own cost, computed
# exactly: Σ_shingle df·(df−1)/2 IS the number of pair rows the brute
# equi-join shuffles into its aggregation, and the df table is one
# map-side-combined aggregate over the shingle frame both plans build
# anyway.  Brute's cost is ~linear while pair rows stay a small multiple
# of the shingle rows; the factor 16 sits safely between the measured
# regimes (even corpora ≈ 0.1-2 pair rows per shingle row; the templated
# probe ≈ 360).
_JACCARD_BRUTE_FACTOR = 16


def choose_jaccard_plan(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[str, dict]:
    """Pick 'brute' (shingle equi-join) or 'prefix' (PPJoin prefix filter)
    for an exact-Jaccard self-join, from a measured signal instead of the
    caller's guess: the exact pair-row count of the brute join
    (Σ df·(df−1)/2 over the shingle document-frequency table).  One
    aggregate-sized job; the returned dict carries the evidence.

    ``threshold`` guards the degenerate end: at t < 0.1 the prefix is
    L − ⌈tL⌉ + 1 ≈ the whole set, so prefix filtering prunes nothing by
    construction and brute is always right regardless of concentration."""
    if threshold < 0.1:
        return "brute", {"reason": "threshold < 0.1: prefix prunes nothing"}
    sh = doc_shingles(df, n, text_col, id_col)
    row = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .agg(
            # df·(df−1) is always even, so integer DIV keeps the sum exact
            # past 2^53 pair rows (double division would not — ADVICE r10)
            F.sum(F.expr("_df * (_df - 1) DIV 2")).cast("long").alias("pair_rows"),
            F.sum("_df").cast("long").alias("shingle_rows"),
        )
        .first()
    )
    pair_rows = int(row["pair_rows"] or 0)
    shingle_rows = int(row["shingle_rows"] or 0)
    plan = (
        "prefix"
        if pair_rows > _JACCARD_BRUTE_FACTOR * shingle_rows
        else "brute"
    )
    return plan, {
        "est_pair_rows": pair_rows,
        "shingle_rows": shingle_rows,
        "factor": _JACCARD_BRUTE_FACTOR,
    }


def ngram_jaccard_auto(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    plan: str = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard self-join with crossover-aware plan dispatch:
    ``plan="auto"`` (default) routes through ``choose_jaccard_plan`` —
    even corpora get the brute shingle equi-join (measured faster through
    400k docs), template-concentrated corpora get the prefix-filtered
    PPJoin plan (measured 6.5× at 100k boilerplate docs) — and both plans
    produce IDENTICAL pairs (the prefix filter is exact, not a cap), so
    dispatch never changes values, only the physical plan.  ``plan=
    "brute"`` / ``"prefix"`` force a path (benches and parity tests pin
    them).  Intended for the near-dup regime (t ≥ ~0.5); low thresholds
    route to brute by construction."""
    if plan == "auto":
        plan, _ = choose_jaccard_plan(df, n, threshold, text_col, id_col)
    if plan == "brute":
        return ngram_jaccard_pairs(
            df, n=n, threshold=threshold, text_col=text_col, id_col=id_col
        )
    if plan == "prefix":
        return jaccard_prefix_pairs(
            df, n=n, threshold=threshold, text_col=text_col, id_col=id_col
        )
    raise ValueError(f"unknown jaccard plan: {plan!r}")


def containment_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """ASYMMETRIC n-gram containment self-join: ordered pairs (id_a, id_b)
    where |A∩B| / |A| ≥ threshold — document A's shingle set is mostly
    inside B's.  The subset/quotation detector Jaccard misses: a short doc
    fully quoted inside a long one has tiny Jaccard (the union is the long
    doc) but containment 1.0.  This is the "containment MinHash" problem
    (Broder 1997's original resemblance-vs-containment distinction —
    public); here it is computed EXACTLY with the same shingle equi-join
    shape as ``ngram_jaccard_pairs`` (cost Σ df² over shingles, never
    corpus²; same opt-in ``max_doc_freq`` stop-phrase guard).

    DataFrame[(id_a, id_b, n_common, size_a, size_b, containment)] for
    ordered pairs id_a ≠ id_b (both directions — containment is
    directional by definition).

    Plan shape: set sizes ride on the shingle rows (``doc_shingles_sized``)
    and flow through the pair groupBy, so the whole operator is one
    equi-join + one aggregate.  At ``threshold`` > 0 the directional
    length filter prunes inside the join condition: |A∩B| ≤ |B| always,
    so |A∩B|/|A| ≥ t requires |B| ≥ t·|A| — size-incompatible ordered
    pairs never reach the pair-count shuffle.
    """
    sh = doc_shingles_sized(df, n, text_col, id_col)
    if max_doc_freq is not None:
        banned = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("shingle")
        )
        # set sizes change once shingles are banned: recount per doc and
        # re-attach on-row so the sized-groupBy contract below still holds
        sh = (
            sh.drop("size")
            .join(F.broadcast(banned), "shingle", "left_anti")
            .withColumn("size", F.count("*").over(Window.partitionBy("id")))
        )
    # self-joined below: without the persist the tokenize+shingle lineage
    # (and, with max_doc_freq, the anti-join + size-recount window) is
    # compiled and executed once PER SIDE — the corpus would be scanned
    # and shingled twice.  Library-owned (README "Cache ownership"): the
    # returned frame is lazy over this persist; release_caches() frees it.
    from hnsw_spark.plans.cachereg import owned_persist

    sh = owned_persist(sh)
    pair_cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.id") != F.col("b.id")
    )
    if threshold > 0.0:
        pair_cond = pair_cond & (
            F.col("b.size") >= threshold * F.col("a.size")
        )
    return (
        sh.alias("a")
        .join(sh.alias("b"), pair_cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.size")).alias("size_a"),
            F.first(F.col("b.size")).alias("size_b"),
        )
        .withColumn("containment", F.col("n_common") / F.col("size_a"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_common", "size_a", "size_b", "containment")
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, n_unique, novelty_fp): per-doc share of distinct
    word n-grams with corpus document-frequency 1, as a 1e-6 fixed-point
    integer-DIV ratio.  Docs with no shingles (< n words) ARE emitted, as
    (doc_id, 0, 0, NULL) — a consumer must be able to tell "no data" from
    silent absence, which would read as "not novel" (ADVICE r6).  The cheap
    memorization/boilerplate screen that needs no pair generation — Σ df
    work on the shingle table the dedup ladder already builds (the SAME
    ``doc_shingles`` frame: per-row array_distinct set representation, no
    post-explode corpus shuffle, narrow-input fan-out guard)."""
    # df-per-shingle as a window count over the shingle partitioning: the
    # old groupBy(shingle) + join-back evaluated the scan+explode shingle
    # pipeline TWICE (the aggregate's map-side partials make its exchange
    # subtree differ from the join side's, so ReuseExchange never fires)
    # and shuffled the shingle frame twice; one window pass shuffles it
    # once and reads it once.  Same hot-shingle skew behavior as the join
    # (both route a shingle's rows to one partition).
    from pyspark.sql import Window

    sh = doc_shingles(df, n, text_col, id_col)
    with_df = sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    per = with_df.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
    )
    # left-join back to the full id set so shingle-less docs survive the
    # inner aggregation above (they have no rows in the shingle frame)
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    per = ids.join(per, "id", "left")
    return per.select(
        F.col("id").alias("doc_id"),
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        F.when(
            F.col("n_shingles") > 0,
            F.expr("(n_unique * 1000000) div n_shingles"),
        ).cast("bigint").alias("novelty_fp"),
    )


def duplicate_spans(
    pairs: DataFrame,
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level diagnosis of near-dup candidate pairs: for each
    (id_a, id_b) pair, the LONGEST common contiguous word run and the
    total count of matching n-gram positions — the CCNet/RefinedWeb-style
    signal separating "same boilerplate header" (short shared span) from
    "one document quotes half the other" (long span), which a scalar
    Jaccard cannot distinguish.

    Method: positional n-gram shingles (id, pos, shingle); matches between
    the pair's docs land on diagonals d = pos_a − pos_b; within a diagonal
    a run of R consecutive matching positions is a common word run of
    R + n − 1 words (gaps-and-islands per diagonal — the same technique
    the temporal episode operators use, applied to text geometry).

    Scale shape: pair verification only — the positional-shingle join is
    driven BY the candidate pair list (pairs ⋈ shingles_a ⋈ shingles_b on
    the shingle), so cost is Σ over pairs of doc-length work, never
    corpus²; the islands window partitions by (pair, diagonal)."""
    from hnsw_spark.functions.text import shingles_w, words

    pos3 = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(shingles_w(words(text_col), n)).alias("pos0", "sh"),
    ).select("id", (F.col("pos0") + 1).alias("pos"), "sh")
    p = pairs.select("id_a", "id_b")
    a = pos3.select(
        F.col("id").alias("id_a"), F.col("pos").alias("pa"), F.col("sh").alias("sha")
    )
    b = pos3.select(
        F.col("id").alias("_idb"), F.col("pos").alias("pb"), F.col("sh").alias("shb")
    )
    m = (
        p.join(a, "id_a")
        .join(
            b,
            (F.col("id_b") == F.col("_idb")) & (F.col("sha") == F.col("shb")),
        )
        .select("id_a", "id_b", "pa", "pb")
    )
    isl = m.select(
        "id_a",
        "id_b",
        (F.col("pa") - F.col("pb")).alias("diag"),
        "pa",
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    isl = isl.withColumn("grp", F.col("pa") - F.row_number().over(w))
    runs = isl.groupBy("id_a", "id_b", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run")
    )
    longest = runs.groupBy("id_a", "id_b").agg(
        (F.max("run") + F.lit(n - 1)).alias("longest_span_words")
    )
    nm = m.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_matches"))
    # left joins from the candidate list: a pair that shares no positional
    # n-gram at THIS n (candidates can come from a coarser shingle size) is
    # still reported, as (0, 0) — silent omission would make a consumer
    # read "no diagnosis" as "not a candidate"
    return (
        p.join(longest, ["id_a", "id_b"], "left")
        .join(nm, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("longest_span_words", F.lit(0))
            .cast("bigint")
            .alias("longest_span_words"),
            F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        )
    )
