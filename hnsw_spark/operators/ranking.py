"""Retrieval ranking-quality metrics: MRR and nDCG@k.

The evaluation half of the retrieval block (BM25 / RRF / vector arms): given
a system ranking and graded relevance judgments, score ranking quality per
query.  This is the reference's recall@k regime (src/bench/metrics.ts:26-35)
extended to the graded/ordered metrics IR practice actually reports
(Järvelin & Kekäläinen, TOIS 2002 — public knowledge).  No reference
counterpart; beyond-reference evaluation operator.

Scale design: one broadcast-or-shuffle equi-join of the (small) judgments
table onto the ranking, one keyed aggregation per query — the same
two-exchange shape as ``recall_table``.  No windows over the corpus, no
driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    gain_scale: int | None = None,
) -> DataFrame:
    """Per-query ranking quality: DataFrame[(query_id, n_judged, hits_at_k,
    mrr, dcg, idcg, ndcg)].

    - ``results``: system ranking, one row per (query, candidate) with a
      1-based ``rank`` (ties already broken by the ranker).
    - ``qrels``: graded judgments (query, id, rel ≥ 1); pairs absent from
      qrels have relevance 0.
    - ``mrr``: 1/rank of the first judged-relevant result within the top-k
      (0 when none).
    - ``dcg`` uses the classic rel/log2(rank+1) gain; ``idcg`` re-ranks the
      query's judgments by grade descending (the ideal ordering), cut at k.
      ``ndcg`` = dcg/idcg (0 for queries with no judgments).
    - ``gain_scale``: when set, each per-hit gain quantizes to
      ``floor(gain·scale + 0.5)`` BIGINT **before** summing (the repo's
      fixed-point-accumulation convention): integer sums are partition- and
      engine-order-invariant where double sums are not, so dcg/idcg become
      exact integers and ndcg a ratio of identical doubles in any engine.
      Unset, dcg/idcg are plain double sums (fine for reporting, not for
      bit-exact cross-engine comparison).

    Queries appearing in ``qrels`` but absent from ``results`` still get a
    row (all-zero metrics) — a system that drops a query must not improve
    the average.
    """
    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rank_col).alias("rank"),
    ).filter(F.col("rank") <= k)
    j = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("id"),
        F.col(rel_col).cast("double").alias("rel"),
    )
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731

    def gain(rel, rank):
        g = rel / log2(rank + 1.0)
        if gain_scale is not None:
            return F.floor(g * float(gain_scale) + 0.5).cast("long")
        return g

    zero = F.lit(0).cast("long") if gain_scale is not None else F.lit(0.0)
    # hit rows: judged-relevant results inside the top-k
    hits = r.join(j, ["query_id", "id"]).select(
        "query_id", "rank", gain(F.col("rel"), F.col("rank")).alias("gain")
    )
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits_at_k"),
        (1.0 / F.min("rank")).alias("mrr"),
        F.sum("gain").alias("dcg"),
    )
    # ideal DCG: the query's own judgments, grade-desc (ties by id for
    # determinism — grade equality makes the gain identical either way)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("id"))
    ideal = (
        j.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(gain(F.col("rel"), F.col("irank"))).alias("idcg"),
            F.count(F.lit(1)).alias("n_judged"),
        )
    )
    return (
        ideal.join(per_q, "query_id", "left")
        .select(
            "query_id",
            "n_judged",
            F.coalesce("hits_at_k", F.lit(0)).alias("hits_at_k"),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.coalesce(F.col("dcg"), zero).alias("dcg"),
            "idcg",
            F.when(
                F.col("idcg") > zero,
                F.coalesce(F.col("dcg"), zero).cast("double")
                / F.col("idcg").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )
