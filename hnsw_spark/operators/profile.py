"""Dataset profiling: the ANALYZE step of a data pipeline — per-column
row/null/distinct counts and numeric ranges, computed in ONE corpus pass.

Shape at scale: a single aggregate computes every column's statistics
(count, null count, exact distinct, min/max) simultaneously; Catalyst plans
the multi-column ``count(DISTINCT ...)`` set with one Expand + partial
aggregation, so the corpus is scanned once regardless of how many columns
are profiled.  The wide 1-row result is then unpivoted driver-free with
``stack`` into the (column, stats...) long form a catalog stores.  Exact
distinct counts keep the oracle checkable; swap ``approx_count_distinct``
at the call site when 2% error is acceptable and the Expand matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def table_profile(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``cols`` (default: all columns) → one row per column:
    (column, n, n_null, n_distinct, min_num, max_num) with ``min_num`` /
    ``max_num`` NULL for non-numeric columns (exact cross-engine numeric
    comparison; string extrema are collation-dependent and stay out).

    ``approx=True`` swaps the distinct counter for HyperLogLog++
    (``approx_count_distinct``, default rsd 5%): no Expand in the plan, so
    the aggregation input stays one row per input row no matter how many
    columns are profiled — the 100 TB path.  Exact mode is the oracle-
    checkable default; the gate query bounds approx against exact."""
    cols = cols or [f.name for f in df.schema.fields]
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"),
            nd(F.col(c)).alias(f"__nd_{c}"),
            (
                F.min(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mn_{c}"),
            (
                F.max(F.col(c)).cast("double")
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args})"
        " as (column, n, n_null, n_distinct, min_num, max_num)"
    )


def skew_report(
    df: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Join-key skew diagnosis: the numbers an engineer reads before
    shuffling 100 TB on ``key`` — the ``top_n`` heaviest keys with their
    row share and skew factor (count / mean-count-per-key).  A skew factor
    in the hundreds means the biggest key's shuffle partition is that many
    times the average: salt it, broadcast the other side, or let AQE's
    skew-join split it; a flat report means a plain hash shuffle is fine.

    Output: (rank, key, cnt, share, skew_factor), rank by (count DESC,
    key ASC).  One partial-agg shuffle on the key; totals ride as a
    broadcast 1-row aggregate; ratios are integer-derived doubles (the
    share division runs FIRST so the skew product can never overflow a
    BIGINT at any corpus size).  Oracle-facing callers quantize
    (queries/relational.py:join_skew_report emits the _fp form).
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_n_keys")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "rank",
        "key",
        "cnt",
        (F.col("cnt") / F.col("_total")).alias("share"),
        (F.col("cnt") / F.col("_total") * F.col("_n_keys")).alias(
            "skew_factor"
        ),
    )
