"""Seeded synthetic vector datasets (reference S5, src/bench/dataset.ts:28-50).

The reference generates ``count`` × ``dimension`` vectors, uniform [−1, 1) or
gaussian (Box-Muller), ids 0..n−1, from a seeded PRNG (mulberry32).  Exact
PRNG parity is a non-goal (SURVEY §2.1 S5); what must hold is determinism per
seed — and, unlike ``F.rand(seed)``, determinism must survive repartitioning,
so every element is a pure hash of (seed, id, coordinate).  The uniform
variant uses only +,×,÷ and is bit-reproducible in DuckDB; gaussian goes
through libm (ln/cos/sqrt) and is checked statistically instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.functions.hashing import P31, h31, h31_sql


def _unit(id_col, j, seed: int, tag: str):
    """Deterministic uniform [0,1) per (seed, id, coordinate)."""
    key = F.concat(
        F.lit(f"{tag}{seed}_"), id_col.cast("string"), F.lit("_"), j.cast("string")
    )
    return h31(key) / F.lit(float(P31))


def synthetic_vectors(
    spark: SparkSession,
    count: int,
    dimension: int,
    seed: int = 42,
    distribution: str = "uniform",
) -> DataFrame:
    """DataFrame[(vec_id BIGINT, embedding ARRAY<FLOAT>)], ids 0..count−1.

    uniform: elements in [−1, 1).  gaussian: Box-Muller from two hashed
    uniforms.  No shuffle, no driver data: spark.range parallelizes id
    generation and each element is computed where its row lives.
    """
    if distribution not in ("uniform", "gaussian", "clustered"):
        raise ValueError(f"unknown distribution: {distribution!r}")
    base = spark.range(count).withColumnRenamed("id", "vec_id")
    idx = F.sequence(F.lit(0), F.lit(dimension - 1))
    rid = F.col("vec_id")
    if distribution == "uniform":
        elem = lambda j: (_unit(rid, j, seed, "u") * 2.0 - 1.0)
    elif distribution == "clustered":
        # mixture of 128 hashed cluster centers with ±0.15 uniform jitter —
        # the shape real embedding corpora have (and the regime IVF-style
        # coarse quantization is designed for; uniform random is its
        # worst case, with neighbors spread evenly over all lists).
        # Deterministic like the other variants: center from the cluster
        # id, jitter from the row id.
        c = rid % 128
        elem = lambda j: (_unit(c, j, seed, "c") * 2.0 - 1.0) + 0.15 * (
            _unit(rid, j, seed, "n") * 2.0 - 1.0
        )
    else:
        def elem(j):
            u1 = _unit(rid, j, seed, "g1")
            u2 = _unit(rid, j, seed, "g2")
            # Box-Muller (reference src/bench/dataset.ts:207-213); guard u1=0
            safe = F.greatest(u1, F.lit(1e-12))
            return F.sqrt(-2.0 * F.log(safe)) * F.cos(2.0 * math.pi * u2)

    return base.select(
        "vec_id",
        F.transform(idx, lambda j: elem(j).cast("float")).alias("embedding"),
    )


def synthetic_uniform_sql(count: int, dimension: int, seed: int = 42) -> str:
    """DuckDB mirror of the uniform variant (float32 cast included)."""
    u = h31_sql(f"'u{seed}_' || vec_id::VARCHAR || '_' || j::VARCHAR")
    return f"""
SELECT vec_id,
       list_transform(generate_series(0, {dimension - 1}),
                      j -> (({u} / {float(P31)}) * 2.0 - 1.0)::FLOAT) AS embedding
FROM (SELECT range::BIGINT AS vec_id FROM range({count}))
"""


def synthetic_documents(
    spark: SparkSession,
    count: int,
    words_per_doc: int = 40,
    vocab_size: int = 5000,
    seed: int = 42,
    dup_every: int | None = 10,
) -> DataFrame:
    """DataFrame[(doc_id BIGINT, text STRING)] — deterministic synthetic
    corpus for dedup-at-scale probes: word j of doc i is a pure hash of
    (seed, source_id, j), so the corpus is identical under any partitioning.

    ``dup_every`` plants exact duplicates (every Nth doc repeats the text of
    the doc ``N//2`` before it), giving the dedup ladder a known answer:
    planted pairs share a fingerprint, MinHash signature, and LSH buckets.
    No shuffle, no driver data — spark.range + per-row expressions.
    """
    base = spark.range(count).withColumnRenamed("id", "doc_id")
    src = F.col("doc_id")
    if dup_every and dup_every > 1:
        is_dup = (F.col("doc_id") % dup_every == dup_every - 1) & (
            F.col("doc_id") >= dup_every
        )
        src = F.when(is_dup, F.col("doc_id") - dup_every // 2).otherwise(
            F.col("doc_id")
        )
    idx = F.sequence(F.lit(0), F.lit(words_per_doc - 1))
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        (
            h31(
                F.concat(
                    F.lit(f"doc{seed}_"),
                    src.cast("string"),
                    F.lit("_"),
                    j.cast("string"),
                )
            )
            % vocab_size
        ).cast("string"),
    )
    return base.select(
        "doc_id",
        F.array_join(F.transform(idx, word), " ").alias("text"),
    )


def synthetic_documents_sql(
    count: int,
    words_per_doc: int = 40,
    vocab_size: int = 5000,
    seed: int = 42,
    dup_every: int | None = 10,
) -> str:
    """DuckDB mirror of synthetic_documents (hash arithmetic is identical on
    both engines, so the generated text oracle-matches byte-for-byte)."""
    src = "doc_id"
    if dup_every and dup_every > 1:
        src = (
            f"CASE WHEN doc_id % {dup_every} = {dup_every - 1} "
            f"AND doc_id >= {dup_every} THEN doc_id - {dup_every // 2} "
            f"ELSE doc_id END"
        )
    word = (
        "'w' || ("
        + h31_sql(f"'doc{seed}_' || src::VARCHAR || '_' || j::VARCHAR")
        + f" % {vocab_size})::VARCHAR"
    )
    return f"""
SELECT doc_id,
       array_to_string(list_transform(generate_series(0, {words_per_doc - 1}),
                                      j -> {word}), ' ') AS text
FROM (SELECT range::BIGINT AS doc_id, ({src}) AS src
      FROM range({count}))
"""


def synthetic_zipf_tokens(
    spark: SparkSession, count: int, vocab_size: int, seed: int = 42
) -> DataFrame:
    """Seeded skewed token stream, DataFrame[(pos BIGINT, token STRING)].

    Rank r(i) = floor(exp(u_i · ln V)) is log-uniform on 1..V, i.e. a
    Zipf(s=1)-shaped frequency profile — rank r's share ≈ ln((r+1)/r)/ln V
    — which is the adversarial input the heavy-hitter sketch gate needs
    (the fixture corpus is deliberately flat).  Same no-shuffle,
    hash-of-(seed,id) construction as the vector generators above:
    deterministic under any partitioning.
    """
    base = spark.range(count).withColumnRenamed("id", "pos")
    u = _unit(F.col("pos"), F.lit(0), seed, "z")
    rank = F.floor(F.exp(u * float(math.log(vocab_size)))).cast("long")
    return base.select(
        "pos", F.concat(F.lit("t"), rank.cast("string")).alias("token")
    )


def boilerplate_documents(
    spark: SparkSession,
    count: int,
    n_templates: int = 2,
    seed: int = 42,
    template_words: int = 12,
    tail_words: int = 18,
) -> DataFrame:
    """Deterministic TEMPLATE-CONCENTRATED corpus — the boilerplate shape
    (license headers, scaffold HTML, form letters) that blows up the brute
    shingle equi-join's pair aggregation (BENCH_PROTOCOL
    ``jaccard_crossover_recorded``): each doc = a ``template_words``-word
    run shared verbatim by all docs with the same ``doc_id % n_templates``,
    then a ``tail_words``-word unique hash tail; docs with
    ``doc_id % 97 == 0`` reuse the PREVIOUS doc's template AND tail
    (planted near-dups, Jaccard 1.0).  Same no-shuffle hash-of-(seed, id)
    construction as ``synthetic_documents`` — deterministic under any
    partitioning.  Same-template non-dup pairs share ~``template_words − 2``
    shingles (far below near-dup thresholds), so they are pure candidate
    NOISE for any plan that joins on shared shingles."""
    from hnsw_spark.functions.hashing import h31

    base = spark.range(count).withColumnRenamed("id", "doc_id")
    is_dup = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") > 0)
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    tmpl_src = (src % n_templates).cast("string")
    tail_src = src.cast("string")

    def hword(tag, word_src, j):
        return F.concat(
            F.lit(tag),
            (
                h31(
                    F.concat(
                        F.lit(f"{tag}{seed}_"),
                        word_src,
                        F.lit("_"),
                        j.cast("string"),
                    )
                )
                % 100000
            ).cast("string"),
        )

    tmpl = F.transform(
        F.sequence(F.lit(0), F.lit(template_words - 1)),
        lambda j: hword("t", tmpl_src, j),
    )
    tail = F.transform(
        F.sequence(F.lit(0), F.lit(tail_words - 1)),
        lambda j: hword("u", tail_src, j),
    )
    return base.select(
        "doc_id", F.array_join(F.concat(tmpl, tail), " ").alias("text")
    )
