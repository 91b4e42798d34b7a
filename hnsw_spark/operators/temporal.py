"""Temporal join operators: as-of (backward) join.

Not in the reference (whose only temporal notion is bench wall-clock); this
is the standard time-series enrichment primitive a training-data pipeline
needs — "attach the most recent signal known at time t" — expressed in the
one shape that survives 100 TB.

Scale design: the naive formulation is a per-key range join
(``l.ts >= r.ts`` then argmax), which Spark executes as a join explosion —
every left row matches ALL earlier right rows before the top-1 prune, so a
key with n lefts and m rights costs n·m.  Instead we UNION the two sides and
take one window pass per key ordered by (ts, side): a running
``last(right_payload, ignorenulls)`` carries the latest right row forward
into each left row.  Cost: ONE shuffle on the key (the window), zero join
blowup, and AQE-compatible skew handling.  The right payload travels as a
single struct so the carried values always come from ONE right row —
per-column ``last(ignorenulls)`` would stitch different rows together when a
right column is legitimately NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the LATEST
    right row with ``right.on <= left.on`` (within the same ``by`` keys),
    NULLs when no right row precedes it.

    Ties at equal ``on``: the right row matches (<=, DuckDB ASOF JOIN's
    convention); among several right rows sharing the same (keys, on) the
    winner is undefined — pre-aggregate the right side to one row per
    (keys, on) for deterministic output (the oracle query does).

    ``tolerance``: optional max staleness as a Column over
    (left_on, right_on) -> boolean, e.g.
    ``lambda l, r: l - r <= F.expr("INTERVAL 1 HOUR")`` applied post-match;
    stale matches null out rather than falling back to older rows (matching
    pandas ``merge_asof(tolerance=...)``).
    """
    by = [by] if isinstance(by, str) else list(by or [])
    value_cols = value_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    overlap = set(left.columns) & set(value_cols)
    out_names = {c: f"{c}{suffix}" if c in overlap else c for c in value_cols}

    payload = F.struct(
        F.col(on).alias("_r_on"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *by,
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        payload.alias("_rval"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c).alias(c) for c in by],
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rval"].dataType).alias("_rval"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # rights sort before lefts at equal ts (side 0 < 1) => <= match semantics
    w = (
        Window.partitionBy(*by)
        .orderBy("_on", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("_match", F.last("_rval", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        ok = tolerance(F.col("_on"), F.col("_match._r_on"))
        carried = carried.withColumn(
            "_match", F.when(ok, F.col("_match"))
        )
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(out_names[c]) for c in value_cols],
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    by: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order conversion funnel: per key, the earliest step-1 event,
    then the earliest step-2 event AFTER that, and so on (each stage
    anchored to the previous stage's chosen timestamp — the standard
    product-analytics funnel semantics, not mere per-type minima).

    Output: one row per key that completed step 1, with one nullable
    timestamp column ``t_<step>`` per step.

    Scale: one aggregation per stage, each over the type-filtered slice of
    the event stream (the ``event_type = step`` predicate pushes down to
    the parquet scan, so stage k reads only its event type's row group
    pages).  All joins and groupings share the funnel key, so AQE plans
    them on one key distribution; no window over the full stream, no
    row-to-row self-join of the raw events.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(by)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    prev_t = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(by, prev_t), by)
            .filter(F.col(ts_col) > F.col(prev_t))
            .groupBy(by)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        cur = cur.join(nxt, by, "left")
        prev_t = f"t_{step}"
    return cur


def interval_join(
    left: DataFrame,
    windows: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bin_seconds: int = 3600,
    broadcast_windows: bool = True,
) -> DataFrame:
    """Interval (range) join: each left row joins every window with
    ``start <= ts < end`` — the point-in-interval enrichment primitive
    (events → campaign windows, sessions, maintenance periods, SLA bands).
    Windows may overlap; a left row can match several.

    Scale design: the naive non-equi join is a BroadcastNestedLoopJoin —
    every event probes every window, O(N·W).  Instead both sides gain an
    integer time-bin key: a window EXPLODES to one row per ``bin_seconds``
    bucket it covers, an event maps to exactly ONE bucket, and the join
    becomes an equi-join on the bin followed by the residual range
    predicate.  Each matching (event, window) pair meets in exactly one
    bin — the event's — so no post-join dedup is needed.  Cost:
    O(N + W·span/bin) join input instead of O(N·W) comparisons; with
    ``broadcast_windows`` (the common case — window tables are tiny) the
    plan is shuffle-free on the event side.  Pick ``bin_seconds`` near the
    typical window span so windows explode to O(1) buckets each.
    """
    lt = left.schema[ts_col].dataType.simpleString()
    epoch0 = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
        if lt == "timestamp_ntz"
        else "TIMESTAMP '1970-01-01 00:00:00'"
    )

    def _bin(col_name: str) -> Column:
        return F.floor(
            F.expr(f"timestampdiff(SECOND, {epoch0}, {col_name})")
            / F.lit(bin_seconds)
        )

    w_exploded = windows.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin(start_col),
                # end-exclusive: a window ending exactly on a bin boundary
                # does not reach into that bin
                F.floor(
                    (F.expr(f"timestampdiff(SECOND, {epoch0}, {end_col})") - 1)
                    / F.lit(bin_seconds)
                ),
            )
        ),
    )
    if broadcast_windows:
        w_exploded = F.broadcast(w_exploded)
    ev = left.withColumn("_bin", _bin(ts_col))
    joined = ev.join(w_exploded, "_bin").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bin")


def recency_weighted_scores(
    df: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_seconds: int = 86400,
) -> DataFrame:
    """Recency-weighted activity scores: per key,
    Σ value · 2^−⌊age/halflife⌋ with age measured from the corpus max
    timestamp — the freshness-weighting primitive (recent activity counts
    full, each halflife past halves it) used for recency-weighted corpus
    sampling and user-activity ranking.

    Exactness design: the decay exponent is an INTEGER bucket count
    (microsecond age, floor-divided), so the weight is a power of two —
    and multiplying a double by 2^−k only shifts the exponent, which every
    IEEE engine reproduces bit-identically (a fractional-exponent decay
    like e^−λt would differ in the last ulp across libm implementations
    and poison the sum).  Decayed terms then accumulate with the
    fixed-point ``dsum`` convention.

    Shape: one 1-row max-timestamp aggregate broadcast over the scan, one
    groupBy on the key.  Output: (by, n_events, last_ts, recency_score).
    """
    from hnsw_spark.operators.evaluation import dsum

    hl_us = halflife_seconds * 1_000_000
    now = df.agg(F.max(ts_col).alias("_now"))
    aged = df.crossJoin(F.broadcast(now)).withColumn(
        "_k",
        F.floor(
            F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _now)")
            / F.lit(hl_us)
        ),
    )
    decayed = aged.withColumn(
        "_dv", F.col(value_col) * F.pow(F.lit(2.0), -F.col("_k"))
    )
    return decayed.groupBy(by).agg(
        F.count("*").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
        dsum("_dv", 6).alias("recency_score"),
    )


def time_weighted_avg(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    by: str = "event_type",
    id_col: str = "event_id",
    scale: int = 4,
) -> DataFrame:
    """Per-group time-weighted average of an irregularly-sampled series —
    the TWAP/last-observation-carried-forward mean: each observation's
    value holds until the group's NEXT observation, so Σ valueᵢ·Δtᵢ / Σ Δtᵢ
    weighs sparse quiet stretches correctly where a plain ``avg`` would
    not.  The group's last observation spans no interval and carries zero
    weight.  DataFrame[(by, n_events, total_dur_us, twap_fp)] with twap_fp
    the fixed-point (10⁻ˢ-unit) BIGINT mean.

    Engine-invariance: durations are exact BIGINT microseconds — the fixture timestamps' native precision, so elapsed-time and boundary-crossing conventions agree
    (``timestampdiff``), values quantize to 10⁻ˢ fixed point per row, and
    the weighted accumulation runs in decimal(38,0) (dur·q reaches ~10¹⁵
    per row — a BIGINT Σ would silently wrap at 100 TB; DuckDB widens to
    HUGEINT on its own; both ends emit BIGINT, which holds to ~10⁶ rows
    per group at these magnitudes — beyond that raise ``scale`` down).
    The final mean is the exact integer quotient Σdur·q DIV Σdur —
    truncation equals floor for the non-negative inputs this operator
    requires, and an exact-integer DIV can never straddle an engine
    rounding boundary the way float division or decimal-scale division
    can (a decimal(38,6) quotient rounds at 10⁻⁶ while the true rational
    sits 1/Σdur ≈ 10⁻¹² from an integer — floor() over it would be
    engine-dependent).

    Plan: ONE shuffle on the group key; the lead() window and the
    aggregation share that partitioning, so adding the operator to an
    events pipeline costs the same exchange the per-group rollup already
    pays.  Ordering ties break by ``id_col`` so the lead chain is
    deterministic under any partitioning.
    """
    from hnsw_spark.operators.evaluation import dquant

    w = Window.partitionBy(by).orderBy(F.asc(ts_col), F.asc(id_col))
    stepped = events.select(
        by,
        F.col(ts_col).alias("_ts"),
        F.lead(ts_col).over(w).alias("_next"),
        dquant(value_col, scale).alias("_q"),
    )
    dur = F.expr("timestampdiff(MICROSECOND, _ts, _next)")
    per = stepped.select(
        by,
        F.coalesce(dur, F.lit(0)).cast("long").alias("_dur"),
        F.col("_q"),
    )
    agg = per.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_dur").alias("total_dur_us"),
        F.sum((F.col("_dur") * F.col("_q")).cast("decimal(38,0)"))
        .try_cast("long")
        .alias("_wsum"),
    )
    return agg.select(
        by,
        "n_events",
        "total_dur_us",
        # guard the all-zero-duration group (a single observation): NULL
        # mean, matching the oracle's x//0 → NULL — ANSI mode would throw
        F.when(
            F.col("total_dur_us") > 0,
            F.expr("_wsum DIV total_dur_us"),
        ).alias("twap_fp"),
    )


def scd2_intervals(
    events: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event feed: per key,
    consecutive same-state runs collapse into validity intervals
    [valid_from, valid_to) with the open current row flagged (valid_to
    NULL) — the dimension-table materialization every warehouse derives
    from CDC/event feeds.

    DataFrame[(key, state, valid_from, valid_to, is_current, n_events)].

    Plan: ONE shuffle on the key shared by the run-detection window
    (gaps-and-islands lag/sum), the run rollup, and the interval-chaining
    lead window.  Ordering ties break by ``tiebreak_col`` so the run
    boundaries are deterministic under any partitioning."""
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    seq = events.select(
        key,
        F.col(state_col).alias("state"),
        ts_col,
        F.lag(state_col).over(w).alias("prev_state"),
        tiebreak_col,
    )
    runs = seq.withColumn(
        "run_id",
        F.sum(
            F.when(
                F.col("prev_state").isNull()
                | (F.col("prev_state") != F.col("state")),
                1,
            ).otherwise(0)
        ).over(w),
    )
    iv = runs.groupBy(key, "run_id", "state").agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # run_id tiebreak: two consecutive runs share valid_from when a key has
    # two different-state events on the SAME timestamp — ordering by
    # valid_from alone would chain them engine-dependently
    w2 = Window.partitionBy(key).orderBy(F.asc("valid_from"), F.asc("run_id"))
    return iv.select(
        key,
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_events",
    )
