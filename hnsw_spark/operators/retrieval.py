"""Rank-fusion retrieval operators.

Hybrid search — fusing a vector arm (embedding similarity) with a text arm
(lexical overlap) — is the standard modern retrieval stack; reciprocal rank
fusion (RRF, Cormack et al. 2009) is the fusion rule that needs no score
calibration between arms: ``score(d) = Σ_arms 1/(k + rank_arm(d))``.

Scale design: each arm is already a ranked DataFrame (rank = dense 1-based);
fusion is a full-outer join on the doc id — one shuffle on the id, arm count
is small and static.  Absent ranks contribute 0 (the document simply wasn't
retrieved by that arm), which is RRF's standard missing-list handling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_tokens: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 document scores for a token-set query → (id, bm25).

    ``query_tokens`` is a DataFrame[token] (deduplicated internally).  Shape:
    one explode over the corpus feeds BOTH the doc-length table and the
    matched-term tf table (the query token set is broadcast, so non-query
    terms drop before any shuffle); document frequency is derived from the
    tf table (one row per matching doc) and is |q| rows, broadcast into the
    per-term scoring join.  The final per-doc sum uses fixed-point
    quantization (``dquant``) so the score is engine-invariant regardless of
    term summation order — see operators/evaluation.py.

    idf = ln((N − df + 0.5)/(df + 0.5) + 1)  (the standard non-negative
    Robertson–Spärck Jones smoothing); term = idf · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))."""
    from hnsw_spark.functions.text import words
    from hnsw_spark.operators.evaluation import dquant

    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    dlen = tok.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qtok = F.broadcast(query_tokens.select("token").distinct())
    qtf = tok.join(qtok, "token").groupBy("id", "token").agg(
        F.count("*").alias("tf")
    )
    qdf = qtf.groupBy("token").agg(F.count("*").alias("df"))
    per_term = (
        qtf.join(F.broadcast(qdf), "token")
        .join(dlen, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    term = (idf * (F.col("tf") * (k1 + 1.0))) / denom
    return (
        per_term.select("id", dquant(term, 6).alias("_q"))
        .groupBy("id")
        .agg((F.sum("_q").cast("double") / F.lit(1e6)).alias("bm25"))
    )


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked arms into (id, rrf) by reciprocal rank: each arm is a
    DataFrame[(id_col, rank_col)] with 1-based ranks; a doc absent from an
    arm contributes nothing for that arm."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    scored = [
        df.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(f"_s{i}"),
        )
        for i, df in enumerate(arms)
    ]
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), scored)
    rrf = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"_s{i}"), F.lit(0.0)),
        range(1, len(arms)),
        F.coalesce(F.col("_s0"), F.lit(0.0)),
    )
    return joined.select("id", rrf.alias("rrf"))
