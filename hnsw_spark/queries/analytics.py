"""Event-stream analytics batch surface: the batch twins of the streaming
layer plus time-series rollups a 100 TB telemetry pipeline runs daily.

``trending_topn`` is the literal batch twin of ``streaming/trending.py`` —
it feeds the SAME ``rank_trending`` ranking function the streaming sink
uses, so a driver-green row here certifies the ranking semantics of the
continuous query (the streaming side's stream==batch parity pytest closes
the loop on the incremental-state half).

Determinism conventions follow the repo: row_number ties broken on a key
column in BOTH engines; money/value sums fixed-point (``dquant``); raw
stored doubles (min/max/arg-min picks) compared directly — a pick is not
arithmetic, so it is engine-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hnsw_spark.registry import query
from hnsw_spark.sources.tables import load_table

_TOP_N = 3

_TRENDING_SQL = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS win_start,
         date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3
)
SELECT win_start, win_end, rank, event_type, n FROM (
  SELECT *, row_number() OVER (
    PARTITION BY win_start ORDER BY n DESC, event_type) AS rank
  FROM c
) WHERE rank <= {_TOP_N}
"""


@query("trending_topn", _TRENDING_SQL)
def trending_topn_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly trending top-3 event types — the batch twin of the continuous
    trending query (``streaming/trending.py``): tumbling-window counts via
    ``F.window`` (the exact aggregation the watermarked stream maintains
    incrementally) ranked by the SAME ``rank_trending`` helper the
    streaming ``foreachBatch`` sink calls.

    Scale shape: one shuffle on (window, event_type) with map-side partial
    counts; the rank window partitions by window start, so no partition
    ever holds more than #event-types rows."""
    from hnsw_spark.streaming.trending import rank_trending

    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
        )
    )
    return rank_trending(counts, top_n=_TOP_N)


_OHLC_SQL = """
WITH e AS (
  SELECT date_trunc('hour', ts) AS bar_hour, event_type, ts, event_id, value
  FROM events
), r AS (
  SELECT bar_hour, event_type, value,
         row_number() OVER (PARTITION BY bar_hour, event_type
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY bar_hour, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT bar_hour, event_type,
       count(*)::BIGINT AS n_events,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       sum(floor(value * 1000000.0 + 0.5)::BIGINT)::BIGINT AS volume_fp
FROM r GROUP BY bar_hour, event_type
"""


@query("ohlc_bars", _OHLC_SQL)
def ohlc_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candle bars per event type: open/close are the first/last
    stored value by (ts, event_id) — PICKS of stored doubles, not arithmetic,
    hence engine-exact without rounding; high/low are min/max picks; volume
    is the fixed-point value sum (the one computed column).

    Spark side uses ``min_by``/``max_by`` with a (ts, event_id) struct
    ordinal — single-shuffle hash aggregation with map-side partials, no
    rank window at all (the oracle's row_number formulation is the
    SQL-expressible mirror; min_by is the scale-correct plan: O(1) state
    per group per input row)."""
    ev = load_table(spark, sf_dir, "events")
    ordinal = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            F.date_trunc("hour", "ts").alias("bar_hour"),
            "event_type",
            "ts",
            "event_id",
            "value",
        )
        .groupBy("bar_hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", ordinal).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordinal).alias("close"),
            F.sum(
                F.floor(F.col("value") * 1000000.0 + 0.5)
                .cast("bigint")
                .cast("decimal(38,0)")
            ).try_cast("long").alias("volume_fp"),
        )
    )


_PATH_LEN, _PATH_TOP = 3, 20

_PATHS_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id
), c AS (SELECT path, count(*)::BIGINT AS n_users FROM p GROUP BY path)
SELECT path, n_users FROM (
  SELECT *, row_number() OVER (ORDER BY n_users DESC, path) AS rn FROM c
) WHERE rn <= {_PATH_TOP}
"""


@query("top_event_paths", _PATHS_SQL)
def top_event_paths_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: each user's first three event types (by ts,
    event_id) joined into a `view>click>purchase`-style path string, with
    the top-20 paths by user count (ties to the lexicographically smaller
    path).  The behavioral n-gram table behind onboarding-funnel and
    session-intent analyses.

    Scale shape: the per-user rank window shuffles once on user_id; path
    assembly sorts ≤3 structs per user inside the row (array_sort on
    (rn, type) — no second window); the path census is an aggregate over
    #distinct-paths ≤ |event_types|³ rows, and the final top-20 cut is a
    TakeOrdered over that tiny table, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_k = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = first_k.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    census = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        census.orderBy(F.col("n_users").desc(), "path")
        .limit(_PATH_TOP)
        .select("path", "n_users")
    )


_SNAP_CUT = "1998-01-01"

_SNAPSHOT_DIFF_SQL = f"""
WITH s1 AS (
  SELECT o_custkey, count(*)::BIGINT AS n_orders,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS total_fp
  FROM orders WHERE o_orderdate < TIMESTAMP '{_SNAP_CUT}'
  GROUP BY o_custkey
), s2 AS (
  SELECT o_custkey, count(*)::BIGINT AS n_orders,
         sum(floor(o_totalprice * 100.0 + 0.5)::BIGINT) AS total_fp
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(s2.o_custkey, s1.o_custkey) AS custkey,
       CASE WHEN s1.o_custkey IS NULL THEN 'insert'
            WHEN s2.o_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       coalesce(s1.n_orders, 0)::BIGINT AS n_orders_before,
       coalesce(s2.n_orders, 0)::BIGINT AS n_orders_after,
       coalesce(s1.total_fp, 0)::BIGINT AS total_fp_before,
       coalesce(s2.total_fp, 0)::BIGINT AS total_fp_after
FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey
WHERE s1.o_custkey IS NULL OR s2.o_custkey IS NULL
   OR s1.n_orders != s2.n_orders OR s1.total_fp != s2.total_fp
"""


@query("snapshot_diff_cdc", _SNAPSHOT_DIFF_SQL)
def snapshot_diff_cdc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff of a materialized per-customer rollup at two
    watermarks (orders before 1998-01-01 vs all orders): emits one change row per
    key whose aggregate state changed — op ∈ insert (key absent before) /
    delete (absent after) / update (aggregates differ) — the change log an
    incremental-view-maintenance consumer applies downstream (complement of
    ``incremental_rollup``, which certifies merge-of-partials; this query
    certifies the DIFF direction).

    Scale shape: both snapshots reduce the fact table to per-key aggregates
    BEFORE the full-outer join, so the join carries |keys| rows, not
    |orders|; money compared in fixed-point cents so 'changed' is an exact
    integer predicate in any engine."""
    orders = load_table(spark, sf_dir, "orders")
    fp = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(fp.cast("decimal(38,0)")).try_cast("long").alias("total_fp"),
        )

    s1 = snap(orders.filter(F.col("o_orderdate") < F.lit(_SNAP_CUT).cast("timestamp_ntz")))
    s2 = snap(orders)
    a = s1.select(
        F.col("o_custkey").alias("k1"),
        F.col("n_orders").alias("n_orders_before"),
        F.col("total_fp").alias("total_fp_before"),
    )
    b = s2.select(
        F.col("o_custkey").alias("k2"),
        F.col("n_orders").alias("n_orders_after"),
        F.col("total_fp").alias("total_fp_after"),
    )
    j = a.join(b, a["k1"] == b["k2"], "full_outer")
    op = (
        F.when(F.col("k1").isNull(), F.lit("insert"))
        .when(F.col("k2").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    changed = (
        F.col("k1").isNull()
        | F.col("k2").isNull()
        | (F.col("n_orders_before") != F.col("n_orders_after"))
        | (F.col("total_fp_before") != F.col("total_fp_after"))
    )
    return j.filter(changed).select(
        F.coalesce(F.col("k2"), F.col("k1")).alias("custkey"),
        op.alias("op"),
        F.coalesce("n_orders_before", F.lit(0)).alias("n_orders_before"),
        F.coalesce("n_orders_after", F.lit(0)).alias("n_orders_after"),
        F.coalesce("total_fp_before", F.lit(0)).alias("total_fp_before"),
        F.coalesce("total_fp_after", F.lit(0)).alias("total_fp_after"),
    )


_LATE_BUCKET, _LATE_THRESH_US = 1024, 3_600_000_000

_LATENESS_SQL = f"""
WITH arr AS (
  SELECT event_id, ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS watermark
  FROM events
), late AS (
  SELECT date_trunc('hour', ts) AS event_hour,
         date_diff('microsecond', ts, watermark)::BIGINT AS late_us
  FROM arr
)
SELECT event_hour, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_us > {_LATE_THRESH_US} THEN 1 ELSE 0 END)::BIGINT
         AS n_late_1h,
       max(late_us)::BIGINT AS max_late_us
FROM late GROUP BY event_hour
"""


@query("watermark_lateness_report", _LATENESS_SQL)
def watermark_lateness_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-design audit: with arrival order = event_id, how far
    behind the running max event-time does each event arrive?  Per
    event-time hour: event count, events more than 1 h late (what a 1 h
    watermark would drop), and the worst lateness — THE report read before
    choosing a Structured Streaming watermark for this source
    (streaming/ingest.py's default comes from exactly this distribution).

    Scale shape — distributed prefix max, no global window: the oracle's
    single ``ORDER BY event_id ROWS UNBOUNDED PRECEDING`` window would run
    one-partition at corpus scale, so the plan splits arrival order into
    1024-row buckets (_LATE_BUCKET), takes per-bucket maxima (one
    aggregate), runs the running max over the BUCKET table (tiny, one
    partition of n/1024 rows), and broadcasts it back as each bucket's
    carry-in:
    max is associative, so two-level == global, bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    bucket = F.expr(f"event_id div {_LATE_BUCKET}")
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = ev.withColumn("bucket", bucket).withColumn(
        "run_in", F.max("ts").over(w_in)
    )
    bmax = (
        within.groupBy("bucket")
        .agg(F.max("ts").alias("bmax"))
    )
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bmax.select(
        "bucket", F.max("bmax").over(w_b).alias("prev_max")
    )
    arr = within.join(F.broadcast(carry), "bucket").select(
        "ts",
        F.when(
            F.col("prev_max").isNull() | (F.col("run_in") >= F.col("prev_max")),
            F.col("run_in"),
        )
        .otherwise(F.col("prev_max"))
        .alias("watermark"),
    )
    late = arr.select(
        F.date_trunc("hour", "ts").alias("event_hour"),
        F.expr("timestampdiff(MICROSECOND, ts, watermark)")
        .cast("bigint")
        .alias("late_us"),
    )
    return late.groupBy("event_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("late_us") > _LATE_THRESH_US, 1).otherwise(0)
        ).cast("bigint").alias("n_late_1h"),
        F.max("late_us").alias("max_late_us"),
    )


_RFM_SQL = """
WITH agg AS (
  SELECT user_id,
         max(ts) AS last_ts,
         count(*)::BIGINT AS frequency,
         sum(floor(value * 1000000.0 + 0.5)::BIGINT)::BIGINT AS monetary_fp
  FROM events GROUP BY user_id
), t AS (SELECT max(last_ts) AS now FROM agg),
m AS (
  SELECT user_id, frequency, monetary_fp,
         (date_diff('microsecond', last_ts, t.now) // 1000000)::BIGINT
           AS recency_s
  FROM agg, t
), n AS (SELECT count(*)::BIGINT AS n_users FROM m),
r AS (
  SELECT m.*, n.n_users,
         row_number() OVER (ORDER BY recency_s, user_id) AS rk_r,
         row_number() OVER (ORDER BY frequency DESC, user_id) AS rk_f,
         row_number() OVER (ORDER BY monetary_fp DESC, user_id) AS rk_m
  FROM m, n
)
SELECT user_id, recency_s, frequency, monetary_fp,
       (5 - (5 * (rk_r - 1)) // n_users)::INT AS r_score,
       (5 - (5 * (rk_f - 1)) // n_users)::INT AS f_score,
       (5 - (5 * (rk_m - 1)) // n_users)::INT AS m_score
FROM r
"""


@query("user_rfm_scores", _RFM_SQL)
def user_rfm_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM feature table: per user, recency in exact integer seconds
    behind the corpus frontier, event frequency, fixed-point monetary
    total, and 1-5 quintile scores (5 = best) via the floor-index rank
    cut — deterministic ties on user_id, no ntile (whose remainder
    distribution is engine-defined).

    Scale shape: the corpus reduces to one row per user BEFORE any window;
    the three rank windows run over the user dimension only.  For user
    counts where even that table is too wide for one partition, the
    quantile cut swaps for the two-pass bucket-threshold trick
    (``token_budget_selection``); at fixture scale the honest plan is the
    simple one."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("value") * 1000000.0 + 0.5)
            .cast("bigint")
            .cast("decimal(38,0)")
        ).try_cast("long").alias("monetary_fp"),
    )
    t = agg.agg(F.max("last_ts").alias("now"))
    n = agg.agg(F.count(F.lit(1)).alias("n_users"))
    m = agg.crossJoin(F.broadcast(t)).select(
        "user_id",
        "frequency",
        "monetary_fp",
        F.expr("timestampdiff(MICROSECOND, last_ts, now) div 1000000")
        .cast("bigint")
        .alias("recency_s"),
    )
    rk_r = F.row_number().over(Window.orderBy("recency_s", "user_id"))
    rk_f = F.row_number().over(
        Window.orderBy(F.col("frequency").desc(), "user_id")
    )
    rk_m = F.row_number().over(
        Window.orderBy(F.col("monetary_fp").desc(), "user_id")
    )
    ranked = m.crossJoin(F.broadcast(n)).select(
        "user_id",
        "recency_s",
        "frequency",
        "monetary_fp",
        rk_r.alias("rk_r"),
        rk_f.alias("rk_f"),
        rk_m.alias("rk_m"),
        "n_users",
    )
    score = lambda rk: (  # noqa: E731
        F.lit(5) - F.expr(f"(5 * ({rk} - 1)) div n_users")
    ).cast("int")
    return ranked.select(
        "user_id",
        "recency_s",
        "frequency",
        "monetary_fp",
        score("rk_r").alias("r_score"),
        score("rk_f").alias("f_score"),
        score("rk_m").alias("m_score"),
    )


_GSPLIT_FRAC = 0.8  # train share of USERS (not events)

_GROUPED_SPLIT_SQL = f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5(user_id::VARCHAR || 'gsplit'), 1, 8))::BIGINT
                   / 4294967296.0 < {_GSPLIT_FRAC}
              THEN 'train' ELSE 'eval' END AS split
  FROM (SELECT DISTINCT user_id FROM events)
), j AS (
  SELECT u.split, e.user_id, e.event_id
  FROM events e JOIN u USING (user_id)
), straddle AS (
  SELECT count(*)::BIGINT AS n_straddlers FROM (
    SELECT user_id FROM j GROUP BY user_id
    HAVING count(DISTINCT split) > 1)
)
SELECT split, count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events,
       (SELECT n_straddlers FROM straddle) AS n_straddlers
FROM j GROUP BY split
"""


@query("grouped_split_gate", _GROUPED_SPLIT_SQL)
def grouped_split_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/eval split (GroupKFold semantics): the split is
    assigned to the USER via the append-stable md5 unit hash, and every
    event inherits its user's split — so no user's behavior can leak from
    train into eval, the failure mode a row-level split has on behavioral
    data.  The gate certifies it: n_straddlers (users seen in both splits)
    is computed from the assignment itself and must be 0, alongside
    per-split user/event counts.

    Scale shape: the distinct-user frame is aggregate-sized; the split is
    a scan-stage expression on it; events inherit via one broadcast-able
    equi-join on user_id.  Same hash convention as ``dataset_split``
    (operators/curation.py:_unit_hash), so a user keeps their split when
    the corpus grows — eval never contaminates under appends."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit("gsplit"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    u = users.select(
        "user_id",
        F.when(h < _GSPLIT_FRAC, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    j = ev.select("user_id", "event_id").join(F.broadcast(u), "user_id")
    straddle = (
        j.groupBy("user_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_straddlers"))
    )
    return (
        j.groupBy("split")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .crossJoin(F.broadcast(straddle))
    )


# ---- Markov next-event transitions -------------------------------------------

_TRANSITIONS_SQL = """
WITH nxt AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), c AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ((n * 1000000) // sum(n) OVER (PARTITION BY from_type))::BIGINT
         AS prob_fp
FROM c
"""


@query("event_transitions", _TRANSITIONS_SQL)
def event_transitions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every (from_type, to_type) pair, the transition count and the
    row-normalized probability as a 1e-6 fixed-point integer — the
    session-model input for next-action prediction / anomaly scoring.

    Scale shape: ONE keyed shuffle (the per-user event-time window —
    events co-partition by user_id, the same partitioning sessionize and
    funnel reuse); the pair census reduces to |types|² rows, so the
    row-normalizing window runs over an aggregate-sized frame.  The lead()
    ordering is (ts, event_id) in both engines, so ties cannot flip."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.withColumns(
        {"_tot": F.sum("n").over(tot)}
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) div _tot").cast("bigint").alias("prob_fp"),
    )


# ---- DAU / WAU stickiness -----------------------------------------------------

_DAU_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), dau AS (
  SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY day
)
SELECT d.day, d.dau, count(DISTINCT u.user_id)::BIGINT AS wau,
       ((d.dau * 1000000) // count(DISTINCT u.user_id))::BIGINT
         AS stickiness_fp
FROM dau d
JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day, d.dau
"""


@query("dau_wau_stickiness", _DAU_WAU_SQL)
def dau_wau_stickiness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day active users, and the DAU/WAU
    "stickiness" ratio (1e-6 fixed point) — the product-analytics staple.

    Scale shape: the corpus-sized work is ONE distinct on (day, user_id)
    that collapses the event stream to at most days×users rows; the day
    table is aggregate-sized and broadcast, so the trailing-window
    expansion is a 7×|du| range join on a tiny build side — never a
    self-join of raw events, and no per-day rescan.  A 100 TB stream with
    bounded users-per-day keeps every frame after the first distinct
    broadcast-sized."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    joined = du.alias("u").join(
        F.broadcast(dau.alias("d")),
        (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
        & (F.col("u.day") <= F.col("d.day")),
    )
    return (
        joined.groupBy(F.col("d.day").alias("day"), F.col("d.dau").alias("dau"))
        .agg(F.count_distinct(F.col("u.user_id")).alias("wau"))
        .withColumn(
            "stickiness_fp",
            F.expr("(dau * 1000000) div wau").cast("bigint"),
        )
    )


# ---- Robust daily-volume anomaly flags ----------------------------------------

_OUTLIER_DAYS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
), med AS (
  SELECT max(CASE WHEN rn = floor(50.0/100*(n-1))+1 THEN n_events END) AS med
  FROM (SELECT n_events, row_number() OVER (ORDER BY n_events) AS rn,
               count(*) OVER () AS n
        FROM daily)
), dev AS (
  SELECT day, n_events, med, abs(n_events - med)::BIGINT AS absdev
  FROM daily, med
), mad AS (
  SELECT max(CASE WHEN rn = floor(50.0/100*(n-1))+1 THEN absdev END) AS mad
  FROM (SELECT absdev, row_number() OVER (ORDER BY absdev) AS rn,
               count(*) OVER () AS n
        FROM dev)
)
SELECT day, n_events, med, mad,
       CASE WHEN mad > 0
            THEN ((absdev * 1000000) // mad)::BIGINT END AS z_fp,
       CASE WHEN mad > 0 AND (absdev * 1000000) // mad >= 3000000
            THEN 1 ELSE 0 END::BIGINT AS is_outlier
FROM dev, mad
"""


@query("robust_outlier_days", _OUTLIER_DAYS_SQL)
def robust_outlier_days_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily-volume anomaly detection: each day's
    event count scored as a fixed-point robust z = |n − median| / MAD,
    flagged at z ≥ 3 — the monitoring primitive that, unlike mean/stddev,
    a single crashed-ingest day cannot poison.  Pure-BIGINT arithmetic on
    the repo's floor-index percentile convention, so the oracle replays
    it exactly.

    Scale shape: the only corpus-sized stage is the daily groupBy (one
    shuffle, partial-aggregated map-side); median and MAD are floor-index
    percentiles over the days frame (aggregate-sized) attached back as
    single-row broadcasts — no global sort of raw events anywhere."""
    from hnsw_spark.operators.evaluation import percentile_floor

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    med = percentile_floor(daily, "n_events", (50,)).select(
        F.col("p50").alias("med")
    )
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "absdev", F.abs(F.col("n_events") - F.col("med")).cast("bigint")
    )
    mad = percentile_floor(dev, "absdev", (50,)).select(
        F.col("p50").alias("mad")
    )
    z = F.expr("(absdev * 1000000) div mad")
    return dev.crossJoin(F.broadcast(mad)).select(
        "day",
        "n_events",
        "med",
        "mad",
        F.when(F.col("mad") > 0, z).cast("bigint").alias("z_fp"),
        F.when((F.col("mad") > 0) & (z >= 3000000), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_outlier"),
    )


# ---- daily event-type pivot ----------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT     AS n_view,
       count(*) FILTER (WHERE event_type IN
         ('click','error','purchase','signup','view'))::BIGINT AS n_total
FROM events GROUP BY 1
"""


@query("events_type_pivot", _PIVOT_SQL)
def events_type_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily long-to-wide PIVOT: one row per day, one count column per
    event type plus the row total — the dashboard-matrix shape every BI
    export of an event stream ends up in.

    Scale shape: ``pivot`` is called WITH the explicit value list, which
    matters twice at 100 TB — it skips the eager extra corpus pass Spark
    otherwise runs just to discover the distinct pivot values, and it
    keeps the output schema statically known so downstream plans compile
    without an action.  The compiled plan is ONE parquet scan into a
    (day, type) count with map-side partials, then a day-keyed pivotfirst
    — both exchanges move aggregate-sized frames (≤ days×types rows), so
    the corpus is read and reduced exactly once, never per-type.  Missing
    (day, type) cells surface as NULL and are coalesced to 0, matching
    the FILTER count's 0 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    counts = [
        F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
        for t in _PIVOT_TYPES
    ]
    total = sum(
        (F.coalesce(F.col(t), F.lit(0)) for t in _PIVOT_TYPES), F.lit(0)
    ).cast("bigint").alias("n_total")
    return wide.select("day", *counts, total)


# ---- weekly growth accounting --------------------------------------------------

_GROWTH_SQL = """
WITH wu AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
  FROM events
), lab AS (
  SELECT week, user_id,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         min(week) OVER (PARTITION BY user_id) AS first_week
  FROM wu
), weekly AS (
  SELECT week,
         count(*)::BIGINT AS n_active,
         count(*) FILTER (WHERE week = first_week)::BIGINT AS n_new,
         count(*) FILTER (WHERE prev_week IS NOT NULL
                            AND date_diff('day', prev_week, week) = 7
                         )::BIGINT AS n_retained,
         count(*) FILTER (WHERE week <> first_week
                            AND (prev_week IS NULL
                                 OR date_diff('day', prev_week, week) <> 7)
                         )::BIGINT AS n_resurrected
  FROM lab GROUP BY week
)
SELECT week, n_active, n_new, n_retained, n_resurrected,
       CASE WHEN date_diff('day', lag(week) OVER (ORDER BY week), week) = 7
            THEN lag(n_active) OVER (ORDER BY week) - n_retained
       END::BIGINT AS n_churned
FROM weekly
"""


@query("growth_accounting", _GROWTH_SQL)
def growth_accounting_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: per ISO week, active users split into
    new (first-ever week), retained (also active the immediately
    preceding week), and resurrected (returning after a gap), plus
    churned = last week's actives who did not return (prev_active −
    retained, defined only when the preceding calendar week exists in the
    frame).  The canonical DAU/MAU-decomposition both engines pin row-for-row.

    Scale shape: the only corpus-sized stage is the distinct collapse to
    (week, user_id) — the same first move as dau_wau_stickiness, one
    shuffle with map-side partial distinct.  The lag/min labels ride ONE
    user-keyed window over that collapsed frame, the weekly census is
    |weeks|-sized, and the churn lag runs over that tiny aggregate — no
    self-join of activity against itself anywhere."""
    ev = load_table(spark, sf_dir, "events")
    wu = ev.select(
        F.date_trunc("week", "ts").cast("date").alias("week"), "user_id"
    ).distinct()
    uw = Window.partitionBy("user_id").orderBy("week")
    lab = wu.withColumns(
        {
            "prev_week": F.lag("week").over(uw),
            "first_week": F.min("week").over(Window.partitionBy("user_id")),
        }
    )
    is_ret = F.col("prev_week").isNotNull() & (
        F.datediff("week", "prev_week") == 7
    )
    weekly = lab.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum((F.col("week") == F.col("first_week")).cast("long")).alias("n_new"),
        F.sum(is_ret.cast("long")).alias("n_retained"),
        F.sum(
            ((F.col("week") != F.col("first_week")) & ~is_ret).cast("long")
        ).alias("n_resurrected"),
    )
    ww = Window.orderBy("week")
    return weekly.select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.when(
            F.datediff("week", F.lag("week").over(ww)) == 7,
            F.lag("n_active").over(ww) - F.col("n_retained"),
        )
        .cast("bigint")
        .alias("n_churned"),
    )


# ---- leakage-free trailing-window feature backfill ----------------------------

_TWF_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
         CAST(floor(value * 1e4 + 0.5) AS BIGINT) AS q
  FROM events
)
SELECT event_id,
       count(*) OVER w3600 AS n_3600s,
       coalesce(sum(q) OVER w3600, 0)::BIGINT AS sum_3600s_fp,
       count(*) OVER w86400 AS n_86400s,
       coalesce(sum(q) OVER w86400, 0)::BIGINT AS sum_86400s_fp
FROM e
WINDOW
  w3600 AS (PARTITION BY user_id ORDER BY sec
            RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
  w86400 AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
"""


@query("trailing_window_features", _TWF_SQL)
def trailing_window_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct trailing features for EVERY event: the key's
    event count and fixed-point value sum over the trailing 1 h and 24 h
    windows ending strictly BEFORE the row (RANGE frame ``[ts − W, ts)``
    over epoch seconds — same-second peers excluded in both engines), so a
    model trained on the output never sees its own label event
    (operators/features.py:trailing_window_features).  All horizons share
    ONE shuffle on user_id (every RANGE frame rides the same sort); no
    self-join, no explosion — the naive events×events formulation is
    Σ n·w rows.  Sums accumulate decimal(38,0) over dquant BIGINTs, so a
    100 TB key's trailing total nulls loudly instead of wrapping."""
    from hnsw_spark.operators.features import trailing_window_features

    ev = load_table(spark, sf_dir, "events")
    out = trailing_window_features(
        ev,
        horizons_s=[3600, 86400],
        by="user_id",
        ts_col="ts",
        value_col="value",
        scale=4,
    )
    return out.select(
        "event_id", "n_3600s", "sum_3600s_fp", "n_86400s", "sum_86400s_fp"
    )


@query("trailing_features_stream_gate", _TWF_SQL)
def trailing_features_stream_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch==stream parity for the ONLINE feature path
    (streaming/features.py:StreamingTrailingFeatures): the events table
    arrives as 3 time-ordered epochs (fixed date boundaries, so arrival
    lateness is 0 ≤ the 24 h horizon) INCLUDING a replayed final epoch —
    the foreachBatch retry case — and the concatenated per-epoch feature
    partitions must equal the one-shot batch backfill row-for-row: the
    oracle is the SAME trailing-window SQL the batch query hash-checks
    against, so any tail-state truncation, epoch-boundary leak, or replay
    double-count reddens the hash.  State is the bounded trailing TAIL
    (events within max-horizon of the high watermark), never the stream;
    per-epoch cost is one key-shuffle over tail ∪ batch."""
    import os

    from hnsw_spark.queries.index import _scratch_dir
    from hnsw_spark.streaming.features import StreamingTrailingFeatures

    ev = load_table(spark, sf_dir, "events")
    tmp = _scratch_dir("twf_stream_gate_")
    stf = StreamingTrailingFeatures(
        os.path.join(tmp, "out"),
        os.path.join(tmp, "tail"),
        horizons_s=[3600, 86400],
        scale=4,
    )
    b0, b1 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    epochs = (
        ev.filter(F.col("ts") < b0),
        ev.filter((F.col("ts") >= b0) & (F.col("ts") < b1)),
        ev.filter(F.col("ts") >= b1),
    )
    for i, batch in enumerate(epochs):
        stf.process_batch(batch, i)
    stf.process_batch(epochs[2], 2)  # simulated foreachBatch retry replay
    out = spark.read.parquet(os.path.join(tmp, "out"))
    return out.select(
        "event_id", "n_3600s", "sum_3600s_fp", "n_86400s", "sum_86400s_fp"
    )
