"""Mergeable frequency sketches: Misra-Gries heavy hitters.

Training-data-pipeline surface: finding dominant tokens / URLs / domains
in one pass without a full groupBy is the standard first look at a new
100 TB crawl.  Misra-Gries summaries are mergeable with total error
bounded by N/(k+1) (Misra & Gries 1982; Agarwal et al., "Mergeable
summaries", PODS 2012 — public knowledge), which is what makes the
map-side-summary → merge shape work on Spark.

Scale design
------------
One pass: ``mapInPandas`` builds a ≤k-entry summary per partition
(per-batch counting runs in C via pandas ``value_counts``; compaction
subtracts the (k+1)-th largest count from every entry and drops the
non-positives, the bulk form of the MG decrement — each compaction
removes ≥ (k+1)·sub total mass, so the summed subtractions, and with
them every entry's undercount, stay ≤ N/(k+1)).  The merge is a groupBy
over ≤ partitions·k rows — vocabulary-scale, not corpus-scale — followed
by one final compaction expressed as a window over that tiny frame.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _compact(counts: dict, k: int) -> dict:
    if len(counts) <= k:
        return counts
    sub = sorted(counts.values(), reverse=True)[k]
    return {t: c - sub for t, c in counts.items() if c > sub}


def misra_gries(items: DataFrame, col: str = "token", k: int = 200) -> DataFrame:
    """≤k-row heavy-hitter summary of ``items[col]``.

    Returns DataFrame[token STRING, est BIGINT]: est ≤ true count and
    true − est ≤ N/(k+1), so every item with true count > N/(k+1) is
    present.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for tok, n in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(n)
            counts = _compact(counts, k)
        yield pd.DataFrame(
            {"token": list(counts.keys()), "est": list(counts.values())}
        ).astype({"token": str, "est": "int64"})

    parts = items.select(F.col(col).alias(col)).mapInPandas(
        summarize, "token string, est bigint"
    )
    merged = parts.groupBy("token").agg(F.sum("est").alias("est"))
    # final compaction on the vocabulary-sized merged frame
    w = Window.orderBy(F.desc("est"), F.asc("token"))
    ranked = merged.withColumn("_r", F.row_number().over(w))
    sub = ranked.filter(F.col("_r") == k + 1).select(
        F.col("est").alias("_sub")
    )
    return (
        ranked.crossJoin(F.broadcast(sub.groupBy().agg(F.coalesce(F.max("_sub"), F.lit(0)).alias("_sub"))))
        .filter(F.col("est") > F.col("_sub"))
        .filter(F.col("_r") <= k)
        .select("token", (F.col("est") - F.col("_sub")).alias("est"))
    )
