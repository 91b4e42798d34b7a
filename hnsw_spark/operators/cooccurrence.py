"""Windowed token co-occurrence and PMI association scoring.

Training-data-pipeline surface: corpus-level word-association statistics
(PMI) are the standard building block for collocation extraction, phrase
mining, and embedding-quality sanity checks (Church & Hanks 1990, "Word
association norms, mutual information, and lexicography" — public
knowledge).  No reference counterpart; beyond-reference pipeline operator.

Scale design
------------
Pair GENERATION is pure scan-stage Catalyst: for each window offset
``j in 1..window`` the pair list is ``zip_with(slice(w, 1, len-j),
slice(w, j+1, len-j))`` — the shifted-slice formulation from
``functions.text.shingles_w`` (element_at-in-transform would re-tokenize
per pair; the slice/zip form fuses into whole-stage codegen).  The only
shuffles are the two aggregations (pair counts, unigram counts); the raw
corpus is scanned once per aggregate and never joined row-to-row.  The
1-row totals frame is broadcast; the unigram-count join keys are
vocabulary-sized (≪ corpus-sized), and Catalyst/AQE picks broadcast vs
shuffle join by measured size.

PMI is emitted as an engine-invariant fixed-point BIGINT
``floor(ln(x)·10⁶ + 0.5)`` (the ``unigram_logprob`` convention) so DuckDB
and the JVM agree bit-for-bit despite last-ulp ``ln`` divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hnsw_spark.plans.cachereg import owned_persist
from hnsw_spark.functions.text import words


def window_pairs_w(w: Column, window: int = 3) -> Column:
    """Unordered co-occurrence pairs (a ≤ b lexicographically) for all
    position offsets 1..window, as an array<struct<a,b>> column."""
    parts = []
    for j in range(1, window + 1):
        # clamp: docs shorter than offset j would yield a negative slice
        # length (a runtime error, not an empty list)
        length = F.greatest(F.size(w) - j, F.lit(0))
        parts.append(
            F.zip_with(
                F.slice(w, 1, length),
                F.slice(w, j + 1, length),
                lambda x, y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def cooccurrence_counts(
    docs: DataFrame, text_col: str = "text", window: int = 3
) -> DataFrame:
    """Pair frequency table: (a, b, pair_count) over all windowed pairs."""
    w = words(text_col)
    base = docs.select(window_pairs_w(w, window).alias("pairs"))
    return (
        base.select(F.explode("pairs").alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


def pmi_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """PMI-scored co-occurrence pairs with frequency >= min_count.

    pmi = ln( (c_ab/P) / ((c_a/N)·(c_b/N)) ), N = total tokens, P = total
    windowed pairs; emitted fixed-point as pmi_q6 = floor(pmi·10⁶ + 0.5).
    """
    from pyspark import StorageLevel

    # persist the two vocabulary-scale aggregates: totals AND the scored
    # output derive from them, and without the reuse point Catalyst would
    # re-run each corpus scan + aggregation per consumer (the
    # corpus_attrition lesson — 2 corpus scans total, not 4)
    pairs = cooccurrence_counts(docs, text_col, window).transform(owned_persist)
    uni = (
        docs.select(F.explode(words(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(owned_persist)
    )
    totals = pairs.agg(F.sum("pair_count").alias("p_total")).crossJoin(
        uni.agg(F.sum("cnt").alias("n_total"))
    )
    filt = pairs.filter(F.col("pair_count") >= min_count)
    joined = (
        filt.join(uni.withColumnRenamed("token", "a").withColumnRenamed("cnt", "count_a"), "a")
        .join(uni.withColumnRenamed("token", "b").withColumnRenamed("cnt", "count_b"), "b")
        .join(F.broadcast(totals))
    )
    ratio = (
        F.col("pair_count").cast("double")
        * F.col("n_total").cast("double")
        * F.col("n_total").cast("double")
    ) / (
        F.col("p_total").cast("double")
        * F.col("count_a").cast("double")
        * F.col("count_b").cast("double")
    )
    return joined.select(
        "a",
        "b",
        "pair_count",
        "count_a",
        "count_b",
        F.floor(F.log(ratio) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("pmi_q6"),
    )
