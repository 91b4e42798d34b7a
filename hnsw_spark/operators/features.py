"""Point-in-time-correct trailing-window features — the feature-store
backfill primitive: for EVERY fact row, aggregates over the key's trailing
interval ending strictly BEFORE the row itself, so a model trained on the
output never sees information from its own label event (the leakage bug
`scd2_asof_enrich`'s docstring warns about, in aggregate form).

Scale design: one RANGE-frame window per trailing horizon, all sharing ONE
shuffle on the key — Spark evaluates every frame in the same sort order, so
adding horizons costs arithmetic, not exchanges.  No self-join (the naive
formulation joins events to events within the horizon: Σ per-key n·w rows),
no explosion, AQE-skew-compatible.  Sums accumulate in decimal(38,0) over
fixed-point BIGINTs (the repo's dsum convention) so a 100 TB key's trailing
total cannot silently wrap and the output is engine-invariant for a future
DuckDB oracle.

No reference counterpart; standard practice per feature-store literature
(point-in-time joins / "time-travel" training sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import dquant


def trailing_window_features(
    events: DataFrame,
    horizons_s: list[int],
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    scale: int = 4,
) -> DataFrame:
    """Every input row gains, per horizon W seconds: ``n_<W>s`` (count of
    the key's events in ``[ts − W, ts)``) and ``sum_<W>s_fp`` (their
    fixed-point 10⁻ˢ value sum as BIGINT, NULL-safe: horizons with no
    events sum to 0).

    Strictly-before semantics: the frame is ``RANGE BETWEEN W PRECEDING
    AND 1 PRECEDING`` over epoch seconds, so same-timestamp events (the
    row itself included) are EXCLUDED — what "known before the event"
    means when timestamps tie; ``tiebreak_col`` is not needed for frame
    bounds (RANGE frames are value-based) but keeps output order
    deterministic for tests.

    Returns the input columns plus the feature columns.
    """
    if not horizons_s:
        raise ValueError("trailing_window_features requires >= 1 horizon")
    # epoch seconds via timestampdiff (a direct timestamp->bigint cast is
    # disallowed); epoch0 literal matches the column's timestamp flavor
    lt = events.schema[ts_col].dataType.simpleString()
    epoch0 = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
        if lt == "timestamp_ntz"
        else "TIMESTAMP '1970-01-01 00:00:00'"
    )
    epoch = F.expr(f"timestampdiff(SECOND, {epoch0}, {ts_col})")
    df = events.withColumn("_sec", epoch).withColumn(
        "_q", dquant(value_col, scale).cast("decimal(38,0)")
    )
    for w_s in horizons_s:
        frame = (
            Window.partitionBy(by)
            .orderBy("_sec")
            .rangeBetween(-int(w_s), -1)
        )
        df = df.withColumn(
            f"n_{w_s}s", F.count(F.lit(1)).over(frame)
        ).withColumn(
            f"sum_{w_s}s_fp",
            F.coalesce(F.sum("_q").over(frame), F.lit(0)).try_cast("long"),
        )
    return df.drop("_sec", "_q")
