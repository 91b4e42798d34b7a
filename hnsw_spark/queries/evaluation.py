"""Evaluation-operator query surface (reference bench subsystem, E1-E8).

recall@k / mean recall compare the euclidean-similarity top-k ("approx") vs
the cosine top-k ("exact") over the same query batch — the reference's
recall protocol (src/bench/metrics.ts) exercised on a deterministic pair of
result tables.  Latency summaries / percentiles run over ``events.value``
(the driver's designated latency-vector fixture), and the A/B diff compares
the even-event_id half vs the odd half as base/candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnsw_spark.operators.evaluation import (
    ab_compare,
    delta_summary,
    latency_summary,
    mean_recall,
    percentile_floor,
    recall_table,
)
from hnsw_spark.operators.knn import knn_exact
from hnsw_spark.queries.vector import K, N_QUERIES
from hnsw_spark.registry import query
from hnsw_spark.sources.tables import load_table

# ---- recall -----------------------------------------------------------------

_RECALL_CTES = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), b AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings
), s AS (
  SELECT q.query_id, b.id,
         list_dot_product(qv, bv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(bv, bv))) AS cs,
         1.0 / (1.0 + list_distance(qv, bv)) AS es
  FROM q CROSS JOIN b
), ex AS (
  SELECT query_id, id FROM (
    SELECT query_id, id,
           row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, id ASC) rn
    FROM s) WHERE rn <= {K}
), ap AS (
  SELECT query_id, id FROM (
    SELECT query_id, id,
           row_number() OVER (PARTITION BY query_id ORDER BY es DESC, id ASC) rn
    FROM s) WHERE rn <= {K}
), t AS (
  SELECT query_id, count(*)::BIGINT AS total FROM ex GROUP BY query_id
), h AS (
  SELECT ex.query_id, count(*)::BIGINT AS hits
  FROM ex JOIN ap USING (query_id, id) GROUP BY ex.query_id
), rec AS (
  SELECT t.query_id, COALESCE(h.hits, 0)::BIGINT AS hits, t.total,
         COALESCE(h.hits, 0) / t.total AS recall
  FROM t LEFT JOIN h ON t.query_id = h.query_id
)
"""


def _recall_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hnsw_spark.queries.index import cached_exact_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    # the cosine ground truth is the memoized frame the recall/serving rows
    # share (deterministic, so sharing changes no values — VERDICT r11 #6)
    exact = cached_exact_topk(spark, sf_dir)
    approx = knn_exact(emb, qs, k=K, metric="euclidean")
    return recall_table(approx, exact)


@query("recall_at_k", _RECALL_CTES + "SELECT query_id, hits, total, recall FROM rec")
def recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: per-query recall@k (src/bench/metrics.ts:26-44)."""
    return _recall_frames(spark, sf_dir)


@query(
    "mean_recall",
    _RECALL_CTES
    + """SELECT sum(hits)::BIGINT AS hits, sum(total)::BIGINT AS total,
       sum(hits) / sum(total) AS mean_recall FROM rec""",
)
def mean_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: micro-averaged Σhits/Σtotal (src/bench/metrics.ts:70-75)."""
    return mean_recall(_recall_frames(spark, sf_dir))


# ---- percentiles / latency summary -------------------------------------------

def _summary_sql(pred: str, pcols: tuple[int, ...] = (50, 90, 95, 99)) -> str:
    pct = ",\n       ".join(
        f"max(CASE WHEN rn = floor({p}.0/100*(n-1))+1 THEN value END) AS p{p}"
        for p in pcols
    )
    return f"""
  SELECT event_type,
       count(*)::BIGINT AS "count",
       ((sum(floor((value) * 10000.0 + 0.5)::BIGINT))::DOUBLE / 10000.0) / count(value) AS "avg",
       {pct}
  FROM (SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE {pred})
  GROUP BY event_type"""


@query("latency_summary", _summary_sql("TRUE"))
def latency_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: {count, avg, p50, p90, p95, p99} per event_type over events.value
    with the reference's floor-index percentile (src/bench/metrics.ts:51-68)."""
    ev = load_table(spark, sf_dir, "events")
    return latency_summary(ev, "value", ["event_type"])


@query(
    "percentile_floor_global",
    """
SELECT max(CASE WHEN rn = floor(0.0/100*(n-1))+1 THEN value END) AS p0,
       max(CASE WHEN rn = floor(25.0/100*(n-1))+1 THEN value END) AS p25,
       max(CASE WHEN rn = floor(50.0/100*(n-1))+1 THEN value END) AS p50,
       max(CASE WHEN rn = floor(75.0/100*(n-1))+1 THEN value END) AS p75,
       max(CASE WHEN rn = floor(100.0/100*(n-1))+1 THEN value END) AS p100
FROM (SELECT value, row_number() OVER (ORDER BY value) AS rn, count(*) OVER () AS n
      FROM events)
""",
)
def percentile_floor_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: global floor-index percentiles incl. the p=0/p=100 clamp edges."""
    ev = load_table(spark, sf_dir, "events")
    return percentile_floor(ev, "value", (0, 25, 50, 75, 100))


# ---- A/B compare --------------------------------------------------------------

_AB_SQL = f"""
WITH base_m AS ({_summary_sql("event_id % 2 = 0", (95,))}),
cand_m AS ({_summary_sql("event_id % 2 = 1", (95,))})
SELECT COALESCE(b.event_type, c.event_type) AS event_type,
       b."count" AS count_base, c."count" AS count_cand,
       c."count" - b."count" AS count_delta,
       b."avg" AS avg_base, c."avg" AS avg_cand, c."avg" - b."avg" AS avg_delta,
       b.p95 AS p95_base, c.p95 AS p95_cand, c.p95 - b.p95 AS p95_delta,
       b.event_type IS NOT NULL AS in_base,
       c.event_type IS NOT NULL AS in_candidate
FROM base_m b FULL OUTER JOIN cand_m c ON b.event_type = c.event_type
"""


def _ab_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mk = lambda pred: latency_summary(ev.filter(pred), "value", ["event_type"]).select(
        "event_type", "count", "avg", "p95"
    )
    return ab_compare(
        mk(F.col("event_id") % 2 == 0),
        mk(F.col("event_id") % 2 == 1),
        ["event_type"],
        ["count", "avg", "p95"],
    )


@query("ab_compare", _AB_SQL)
def ab_compare_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: full-outer base-vs-candidate metric diff with deltas
    (src/bench/report.ts:126-183); base = even event_id, candidate = odd."""
    return _ab_frames(spark, sf_dir)


@query(
    "ab_delta_summary",
    f"""
WITH diff AS ({_AB_SQL})
SELECT ((sum(floor((count_delta) * 10000.0 + 0.5)::BIGINT))::DOUBLE / 10000.0) / count(count_delta) AS count_delta_avg,
       min(count_delta) AS count_delta_min, max(count_delta) AS count_delta_max,
       ((sum(floor((avg_delta) * 10000.0 + 0.5)::BIGINT))::DOUBLE / 10000.0) / count(avg_delta) AS avg_delta_avg,
       min(avg_delta) AS avg_delta_min, max(avg_delta) AS avg_delta_max,
       ((sum(floor((p95_delta) * 10000.0 + 0.5)::BIGINT))::DOUBLE / 10000.0) / count(p95_delta) AS p95_delta_avg,
       min(p95_delta) AS p95_delta_min, max(p95_delta) AS p95_delta_max
FROM diff
""",
)
def ab_delta_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: avg/min/max per delta column (src/bench/report.ts:94-100)."""
    return delta_summary(_ab_frames(spark, sf_dir), ["count", "avg", "p95"])


_PCT_GATE_PS = (50.0, 90.0, 99.0)
_PCT_GATE_TOL = 0.05  # relative error bound vs the exact floor-index value

_PCT_GATE_SQL = "SELECT " + ", ".join(
    f"true AS p{int(p)}_ok" for p in _PCT_GATE_PS
)


@query("percentile_sketch_gate", _PCT_GATE_SQL)
def percentile_sketch_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percentile SCALE path, gated: ``approx_percentile`` (one-pass
    mergeable sketch — no per-group sort, the plan you run at 100 TB) must
    land within 5% of the exact floor-index percentile on events.value for
    p50/p90/p99.  Same boolean-gate pattern as table_profile_approx_gate
    and the ann recall gates: the sketch is deterministic for a fixed
    input, so the driver's hash check is stable."""
    import pyspark.sql.functions as F

    from hnsw_spark.operators.evaluation import percentile_floor

    ev = load_table(spark, sf_dir, "events")
    exact = percentile_floor(ev, "value", list(_PCT_GATE_PS))
    approx = ev.agg(
        *[
            F.expr(f"approx_percentile(value, {p / 100.0})").alias(
                f"a{int(p)}"
            )
            for p in _PCT_GATE_PS
        ]
    )
    out = exact.crossJoin(approx)
    checks = [
        (
            F.abs(F.col(f"a{int(p)}") - F.col(f"p{int(p)}"))
            <= _PCT_GATE_TOL * F.abs(F.col(f"p{int(p)}"))
        ).alias(f"p{int(p)}_ok")
        for p in _PCT_GATE_PS
    ]
    return out.select(*checks)
