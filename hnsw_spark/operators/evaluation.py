"""Evaluation / aggregation operators (reference bench subsystem).

Parity targets:
- recall@k per query + micro-averaged mean recall — src/bench/metrics.ts:26-44
  and :70-75 (mean = Σhits/Σtotal across queries, NOT mean-of-ratios).
- floor-index percentile — src/bench/metrics.ts:51-57:
  ``sorted[floor(p/100 · (n−1))]``, p clamped to [0,100], 0 on empty.
- latency summary {count, avg, p50, p90, p95, p99} — src/bench/metrics.ts:59-68.
- A/B compare: full-outer join of base vs candidate metric tables on a
  composite key with per-metric deltas (candidate − base) and avg/min/max
  delta summary — src/bench/report.ts:88-183, :94-100.  ``strict`` → inner
  join (report.ts ``--strict``).

Determinism: cross-engine (and cross-partitioning) reproducible float
aggregates use FIXED-POINT accumulation (``dsum``): each row is quantized
with ``floor(x·10ˢ + 0.5)`` — pure IEEE double ops, bit-identical in every
engine — then summed as exact BIGINTs (order-independent).  The earlier
decimal-cast formulation was order-independent but NOT engine-invariant: a
``double → DECIMAL`` cast rounds HALF_UP in Spark but differently in other
engines at exact .5·10⁻ˢ boundaries, and at sf0.1 row counts a handful of
boundary rows flipped, shifting money sums by ~1e-6 vs the DuckDB oracle.
Percentiles use a per-group window (shuffle by group key — scales with group
count, no global sort).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dquant(col: Column | str, scale: int = 4) -> Column:
    """Engine-invariant fixed-point quantization: floor(x·10ˢ + 0.5) as a
    BIGINT.  floor, multiply, and add are IEEE-exact on the same input
    double in every engine, unlike decimal-cast rounding modes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * F.lit(float(10**scale)) + F.lit(0.5)).cast(
        "long"
    )


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent, engine-invariant sum of doubles: exact sum of
    per-row fixed-point BIGINT quantizations (inputs quantized at 10⁻ˢ).

    The accumulator is decimal(38,0), not BIGINT: a BIGINT sum caps at
    ~9.2e18 and wraps SILENTLY in Spark non-ANSI mode — money-scale values
    quantize to ~1e9 per row, so a 100 TB-regime group (~1e10 rows, or a
    cube's grand-total cell) would overflow.  decimal(38,0) holds 10²⁹ of
    headroom and nulls (loudly) rather than wraps beyond that; DuckDB's
    BIGINT sum widens to HUGEINT, so the oracle side was never at risk —
    this keeps the Spark side equivalent instead of silently diverging."""
    return F.sum(dquant(col, scale).cast("decimal(38,0)")).cast(
        "double"
    ) / F.lit(float(10**scale))


def dsum_fp(col: Column | str, scale: int = 4) -> Column:
    """Fixed-point BIGINT sum with the same overflow guard as ``dsum``:
    per-row ``dquant`` BIGINTs accumulated in decimal(38,0) (a plain
    ``F.sum`` over BIGINT wraps SILENTLY in Spark non-ANSI mode at ~9.2e18
    — reachable by a 100 TB-regime group — while DuckDB widens to HUGEINT,
    so the engines would silently diverge exactly when it matters).  The
    final try_cast back to long keeps the column BIGINT: below the overflow
    point it is value-identical to the naive sum, beyond it Spark nulls
    loudly instead of wrapping (a plain cast on decimal→long wraps silently
    in non-ANSI mode; try_cast nulls on overflow under BOTH modes)."""
    return F.sum(dquant(col, scale).cast("decimal(38,0)")).try_cast("long")


def davg(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def recall_table(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall@k: (query_id, hits, total, recall).

    ``hits`` = |approx ∩ exact| per query_id (semi-join on (query_id, id));
    ``total`` = |exact| per query_id (reference src/bench/metrics.ts:26-44).
    Queries present in ``exact`` but absent from ``approx`` get hits=0.
    """
    totals = exact.groupBy("query_id").agg(F.count("*").alias("total"))
    hits = (
        exact.join(approx, ["query_id", "id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        totals.join(hits, "query_id", "left")
        .na.fill(0, ["hits"])
        .select(
            "query_id",
            "hits",
            "total",
            (F.col("hits") / F.col("total")).alias("recall"),
        )
    )


def mean_recall(recalls: DataFrame) -> DataFrame:
    """Micro-average Σhits/Σtotal (reference src/bench/metrics.ts:70-75)."""
    return recalls.agg(
        F.sum("hits").alias("hits"),
        F.sum("total").alias("total"),
        (F.sum("hits") / F.sum("total")).alias("mean_recall"),
    )


def _floor_index(p: float, n: Column) -> Column:
    """1-based row_number of the reference's percentile index:
    floor(p/100 · (n−1)) + 1, with p pre-clamped to [0,100]."""
    p = min(max(p, 0.0), 100.0)
    return F.floor(F.lit(p) / 100.0 * (n - 1)) + 1


def percentile_floor(
    df: DataFrame,
    value_col: str,
    ps: Sequence[float],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact floor-index percentiles, optionally per group.

    Matches src/bench/metrics.ts:51-57 (lower-interpolation index).  Physical
    plan: one shuffle on the group key, per-group sort inside the window —
    no global single-partition sort, so this scales with the number of groups.
    """
    keys = list(group_cols)
    w = Window.partitionBy(*keys).orderBy(value_col)
    cw = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ranked = df.select(*keys, value_col).withColumns(
        {"_rn": F.row_number().over(w), "_n": F.count("*").over(cw)}
    )
    aggs = [
        F.max(
            F.when(F.col("_rn") == _floor_index(p, F.col("_n")), F.col(value_col))
        ).alias(f"p{str(p).replace('.', '_').removesuffix('_0')}")
        for p in ps
    ]
    return ranked.groupBy(*keys).agg(*aggs) if keys else ranked.agg(*aggs)


def latency_summary(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = ()
) -> DataFrame:
    """{count, avg, p50, p90, p95, p99} (reference src/bench/metrics.ts:59-68).

    ``avg`` uses decimal accumulation for cross-engine determinism.
    """
    keys = list(group_cols)
    pct = percentile_floor(df, value_col, (50, 90, 95, 99), keys)
    base = (
        df.groupBy(*keys)
        if keys
        else df.groupBy()
    ).agg(
        F.count(value_col).alias("count"),
        davg(value_col).alias("avg"),
    )
    return base.join(pct, keys) if keys else base.crossJoin(pct)


def ab_compare(
    base: DataFrame,
    candidate: DataFrame,
    key_cols: Sequence[str],
    metric_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Full-outer (or inner with ``strict``) diff of two metric tables.

    Output: key cols + per-metric ``<m>_base``, ``<m>_cand``,
    ``<m>_delta`` (candidate − base; null when either side is missing) +
    ``in_base`` / ``in_candidate`` flags (reference src/bench/report.ts:126-183
    tracks missing keys on both sides).
    """
    keys = list(key_cols)
    b = base.select(*keys, *[F.col(m).alias(f"{m}_base") for m in metric_cols])
    b = b.withColumn("in_base", F.lit(True))
    c = candidate.select(
        *keys, *[F.col(m).alias(f"{m}_cand") for m in metric_cols]
    ).withColumn("in_candidate", F.lit(True))
    how = "inner" if strict else "full_outer"
    out = b.join(c, keys, how)
    for m in metric_cols:
        out = out.withColumn(f"{m}_delta", F.col(f"{m}_cand") - F.col(f"{m}_base"))
    return out.na.fill(False, ["in_base", "in_candidate"])


def delta_summary(diff: DataFrame, metric_cols: Sequence[str]) -> DataFrame:
    """avg/min/max per delta column (reference src/bench/report.ts:94-100)."""
    aggs = []
    for m in metric_cols:
        c = f"{m}_delta"
        aggs += [
            davg(c).alias(f"{c}_avg"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return diff.agg(*aggs)


def classifier_eval(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "query_id",
    pred_col: str = "pred_label",
    truth_id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Classifier agreement summary: one row (n, n_correct, accuracy,
    expected_agreement, kappa) — accuracy plus Cohen's kappa
    (chance-corrected agreement; Cohen 1960, public knowledge), the
    standard scorecard for a weak labeler like ``knn_label_vote`` before
    its labels are trusted for curation.

    kappa = (p_o − p_e)/(1 − p_e) with p_o = accuracy and
    p_e = Σ_l (n_true_l · n_pred_l)/n² from the marginals.  All terms are
    ratios of exact integer counts, so the doubles are engine-identical.
    Degenerate case p_e = 1 (both sides constant) reports kappa 0.

    Scale shape: one equi-join on the id, two keyed marginal aggregations,
    and single-row combines — no window, no corpus shuffle beyond the
    join."""
    from hnsw_spark.plans.cachereg import owned_persist

    # the accuracy aggregate and BOTH marginal aggregations consume this
    # frame, and Spark does not CSE shared subtrees — without the persist
    # the upstream predictor pipeline (e.g. the whole LOO kNN vote) ran
    # once per consumer.  Query-count-sized, library-owned.
    joined = owned_persist(
        pred.select(
            F.col(id_col).alias("_id"), F.col(pred_col).alias("_pred")
        ).join(
            truth.select(
                F.col(truth_id_col).alias("_id"),
                F.col(label_col).alias("_true"),
            ),
            "_id",
        )
    )
    base = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("_pred") == F.col("_true"), 1).otherwise(0)
        ).alias("n_correct"),
    )
    pe = (
        joined.groupBy("_true")
        .agg(F.count(F.lit(1)).alias("n_t"))
        .join(
            joined.groupBy(F.col("_pred").alias("_true")).agg(
                F.count(F.lit(1)).alias("n_p")
            ),
            "_true",
            "inner",
        )
        .agg(F.sum(F.col("n_t") * F.col("n_p")).alias("sum_tp"))
    )
    po = F.col("n_correct") / F.col("n")
    pe_c = F.coalesce(F.col("sum_tp"), F.lit(0)) / (F.col("n") * F.col("n"))
    return (
        base.crossJoin(F.broadcast(pe))
        .select(
            "n",
            "n_correct",
            po.alias("accuracy"),
            pe_c.alias("expected_agreement"),
            F.when(
                pe_c < 1.0, (po - pe_c) / (1.0 - pe_c)
            )
            .otherwise(F.lit(0.0))
            .alias("kappa"),
        )
    )
