"""Physical-layout strategies for the 100 TB design point: bucketed
co-located joins and skew salting.

These are the techniques SURVEY.md §4 notes Catalyst gives "for free" only
when the data layout cooperates:

- **Bucketing** pre-shuffles a table ONCE at write time; any later
  equi-join/aggregation on the bucket key reads co-located buckets and
  skips its Exchange entirely — at 100 TB, re-shuffling the fact table per
  query is the dominant cost, so the big joinable tables (vector corpus by
  id, events by user) should be bucketed at ingest.
- **Salting** splits one pathological hot key across ``n_salts`` tasks when
  AQE's skew-join splitting isn't available (e.g. pre-shuffle aggregations
  or a broadcast-ineligible dimension).  The hot side gets a uniform salt;
  the other side is replicated once per salt value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table; joins and
    aggregations on ``bucket_cols`` against an equally-bucketed table then
    plan without an Exchange (assert_no_shuffle_join in tests)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side with a
    uniform bucket and replicate ``other`` across all buckets, so one hot
    key fans out over ``n_salts`` tasks instead of one straggler.

    Join results are identical to the unsalted join (the salt is an extra
    equi-key that every replicated row satisfies).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    s = skewed.withColumn("_salt", salt.cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, [on, "_salt"], how).drop("_salt")


def explain_has_exchange_above_scan(df: DataFrame) -> bool:
    """True when the physical plan still shuffles its scans — the check
    bucketed layouts are meant to fail."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
