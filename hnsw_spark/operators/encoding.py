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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import dquant


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    alpha: int = 20,
    scale: int = 4,
    out_col: str = "te_fp",
) -> DataFrame:
    """Adds ``out_col``: the leave-one-out smoothed target encoding of
    ``category_col`` as a fixed-point 10⁻ˢ BIGINT.  NULL categories AND
    NULL targets encode as the global mean: a NULL category carries no
    category signal, and a NULL-target row contributes no label — it must
    neither deflate its peers' LOO denominator nor encode as NULL itself
    (ADVICE r6), so all label statistics count only non-NULL targets.

    Targets must be non-negative (labels, rates, prices): integer DIV
    truncates, which equals floor only for non-negative numerators — the
    same convention ``time_weighted_avg`` documents."""
    q = dquant(target_col, scale).cast("decimal(38,0)")
    rows = df.withColumn("_y", q)
    stats = rows.groupBy(category_col).agg(
        F.sum("_y").alias("_cat_sum"),
        # count(_y), not count(*): NULL-target rows are not label evidence
        F.count("_y").alias("_cat_n"),
    )
    glob = rows.agg(
        # exact integer global mean in fixed point over LABELED rows only
        F.expr("sum(_y) DIV count(_y)").alias("_gmean_fp")
    )
    enc = (
        rows.join(F.broadcast(stats), category_col, "left")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out_col,
            F.when(
                F.col("_y").isNull()
                | F.col(category_col).isNull()
                | (F.col("_cat_n") <= 1),
                F.col("_gmean_fp"),
            ).otherwise(
                F.expr(
                    f"(_cat_sum - _y + {int(alpha)} * _gmean_fp)"
                    f" DIV (_cat_n - 1 + {int(alpha)})"
                )
            ).try_cast("long"),
        )
        .drop("_y", "_cat_sum", "_cat_n", "_gmean_fp")
    )
    return enc
