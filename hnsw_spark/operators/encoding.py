"""Leakage-free categorical target encoding — leave-one-out (LOO) with
additive smoothing: each row's feature is the target mean of its category
computed WITHOUT the row itself, shrunk toward the global mean for thin
categories.  Plain per-category means leak the row's own label into its
feature (worst for rare categories, where the feature nearly IS the
label); LOO removes the self-term exactly, at no extra pass.

Scale design: two aggregate-sized shuffles — the per-category (sum, count)
aggregation and the single-row global mean — both map-side combined, so
the corpus itself is never shuffled; category stats broadcast back onto
the rows (category cardinality is vocabulary-sized, not corpus-sized) and
the global mean attaches as a single-row crossJoin.  The LOO identity
(sum − yᵢ)/(n − 1) means no window and no self-join over the corpus.
Target sums accumulate in decimal(38,0) over fixed-point BIGINTs (dquant),
so the encoding is engine-invariant for a future oracle and a 100 TB
category cannot silently wrap.

Smoothing (Micci-Barreca 2001, the standard formulation):
encoded = (loo_sum + alpha · global_mean_fp) / (n − 1 + alpha), emitted as
fixed-point BIGINT via exact integer DIV.  Rows whose category has n = 1
(no peers) fall back to the global mean.

The stats/encode split exists for the streaming twin
(streaming/encoding.py:StreamingTargetEncoder): category stats are
MERGEABLE (decimal sums + counts add), so the online path maintains them
incrementally per epoch and serves encodings by joining the SAME
``encode_with_stats`` expression — batch≡stream parity is structural, not
re-implemented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import dquant


def category_stats(
    df: DataFrame, category_col: str, target_col: str, scale: int = 4
) -> DataFrame:
    """Per-category label evidence: DataFrame[(category, _cat_sum
    decimal(38,0), _cat_n long)] over fixed-point targets.  NULL categories
    form a group like any other (they resolve to the global mean at encode
    time; keeping them here makes the stats table the COMPLETE label
    evidence, so the global mean derives from it — see ``global_from_stats``
    — and the streaming state needs nothing else).  NULL-target rows are
    not label evidence: sums/counts cover non-NULL targets only."""
    q = dquant(target_col, scale).cast("decimal(38,0)")
    return df.select(F.col(category_col), q.alias("_y")).groupBy(
        category_col
    ).agg(
        F.sum("_y").alias("_cat_sum"),
        F.count("_y").alias("_cat_n"),
    )


def global_from_stats(stats: DataFrame) -> DataFrame:
    """The exact fixed-point global mean, derived from the stats table
    itself (decimal sums are exact, so Σ_cat sums ≡ the row-level sum)."""
    return stats.agg(F.expr("sum(_cat_sum) DIV sum(_cat_n)").alias("_gmean_fp"))


def encode_with_stats(
    df: DataFrame,
    stats: DataFrame,
    category_col: str,
    target_col: str,
    alpha: int = 20,
    scale: int = 4,
    out_col: str = "te_fp",
    row_in_stats: bool = True,
) -> DataFrame:
    """Adds ``out_col`` to ``df`` from a (possibly streamed) stats table.

    ``row_in_stats`` is the evidence contract (ADVICE r10):

    - ``True`` (default — the batch path and the streaming parity gate,
      where ``df``'s labels ARE part of ``stats``): leave-one-out — the
      row's own label is subtracted before smoothing.  Callers MUST only
      use this when every encoded row's (category, label) was counted
      into ``stats``; otherwise the subtraction removes evidence that was
      never added and biases the encoding low.
    - ``False`` (online serving over not-yet-streamed rows): the plain
      smoothed category mean — nothing is subtracted, so rows outside the
      evidence are encoded from the evidence as-is.

    NULL categories, NULL targets (only relevant under LOO), and
    categories ABSENT from ``stats`` (left-join miss → NULL ``_cat_n``)
    all encode as the global mean: an unseen category carries no category
    signal yet, exactly like a NULL one.

    Targets must be non-negative (labels, rates, prices): integer DIV
    truncates, which equals floor only for non-negative numerators — the
    same convention ``time_weighted_avg`` documents."""
    if row_in_stats:
        rows = df.withColumn(
            "_y", dquant(target_col, scale).cast("decimal(38,0)")
        )
        fallback = (
            F.col("_y").isNull()
            | F.col(category_col).isNull()
            | F.col("_cat_n").isNull()
            | (F.col("_cat_n") <= 1)
        )
        encoded = F.expr(
            f"(_cat_sum - _y + {int(alpha)} * _gmean_fp)"
            f" DIV (_cat_n - 1 + {int(alpha)})"
        )
    else:
        # serving frames may be UNLABELED — the plain-mean path never
        # reads the target, so don't require the column to exist
        rows = df
        fallback = (
            F.col(category_col).isNull()
            | F.col("_cat_n").isNull()
            | (F.col("_cat_n") <= 0)
        )
        encoded = F.expr(
            f"(_cat_sum + {int(alpha)} * _gmean_fp)"
            f" DIV (_cat_n + {int(alpha)})"
        )
    # NULL-category stats rows never match the left join (SQL null ≠ null),
    # which is correct: those rows take the global-mean branch below
    return (
        rows.join(F.broadcast(stats), category_col, "left")
        .crossJoin(F.broadcast(global_from_stats(stats)))
        .withColumn(
            out_col,
            F.when(fallback, F.col("_gmean_fp"))
            .otherwise(encoded)
            .try_cast("long"),
        )
        .drop("_y", "_cat_sum", "_cat_n", "_gmean_fp")
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    alpha: int = 20,
    scale: int = 4,
    out_col: str = "te_fp",
) -> DataFrame:
    """Adds ``out_col``: the leave-one-out smoothed target encoding of
    ``category_col`` as a fixed-point 10⁻ˢ BIGINT — ``encode_with_stats``
    over this frame's own ``category_stats`` (the one-shot batch path)."""
    stats = category_stats(df, category_col, target_col, scale)
    return encode_with_stats(
        df, stats, category_col, target_col, alpha, scale, out_col
    )
