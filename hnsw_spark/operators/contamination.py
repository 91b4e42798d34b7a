"""Benchmark decontamination: flag training documents whose word n-grams
overlap an evaluation/benchmark set.

This is the standard LLM-pretraining hygiene step (the GPT-3 appendix-C /
PaLM / Llama recipe): any training document sharing enough long n-grams with
a held-out benchmark is suspect — either the benchmark leaked into the crawl
or the crawl leaked into the benchmark — and must be dropped or audited
before training.  It extends the reference's surface (which stops at vector
search) the same way the dedup ladder does: same shingle kernel
(functions/text.py:shingles_w), same equi-join shape, different right side.

Scale shape (the reason this is NOT a Jaccard self-join):
- The benchmark side is SMALL by construction (eval sets are MBs; the corpus
  is TBs), so its distinct n-gram set broadcasts and the probe is a
  broadcast-hash semi-join that pipelines inside the corpus scan stage — the
  corpus is never shuffled.
- Per-document ratios need one groupBy(doc_id) over the exploded corpus
  shingles — a single shuffle whose width is bounded by the corpus's
  distinct (doc, shingle) pairs, with map-side partial counts.
- ``min_df_prune`` optionally drops benchmark n-grams that are so common in
  ordinary text they carry no signal (the analogue of dedup.py's
  ``max_doc_freq`` guard): contamination wants RARE long n-grams, and
  pruning ubiquitous ones shrinks the broadcast and the match fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnsw_spark.functions.text import shingles_w, words


def doc_shingles(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-grams per document → (id, shingle).  One projection +
    one explode + one shuffle: the ``.distinct()`` is a real exchange on
    (id, shingle) and is necessary — contamination overlap counts DISTINCT
    n-grams, so duplicates must collapse before the benchmark probe join."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles_w(words(text_col), n)).alias("shingle"),
        )
        .distinct()
    )


def benchmark_ngrams(
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The benchmark's distinct n-gram set → (shingle).  Small by
    construction; the caller broadcasts it."""
    return (
        bench.select(
            F.explode(shingles_w(words(text_col), n)).alias("shingle")
        )
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap report:
    (doc_id, n_shingles, n_matched, overlap, contaminated).

    ``overlap`` is |doc ∩ benchmark| / |doc| over distinct word n-grams —
    the fraction of the document's n-grams that appear anywhere in the
    benchmark; ``contaminated`` is ``overlap >= threshold``.  Documents with
    fewer than ``n`` words have no n-grams and report 0.0 (never flagged).

    Join strategy: the benchmark n-gram set is broadcast (eval sets are MBs
    against a TB corpus), so the match test is a broadcast LEFT SEMI that
    pipelines in the scan stage; the only shuffle is the per-doc count
    aggregate.  The left join + count(match) formulation below fuses both
    counts into ONE aggregate instead of two joins."""
    from hnsw_spark.plans.parallelism import fan_out_narrow

    docs = fan_out_narrow(docs)
    sh = doc_shingles(docs, n, id_col, text_col)
    bset = benchmark_ngrams(bench, n, id_col, text_col).withColumn(
        "_hit", F.lit(1)
    )
    joined = sh.join(F.broadcast(bset), "shingle", "left")
    per_doc = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("_hit").alias("n_matched"),
    )
    base = docs.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        F.coalesce(
            F.col("n_matched") / F.col("n_shingles"), F.lit(0.0)
        ).alias("overlap"),
    )
    return out.withColumn(
        "contaminated", F.col("overlap") >= F.lit(threshold)
    )
