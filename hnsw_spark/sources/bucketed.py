"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the single most expensive plan node is the shuffle that
co-partitions two large tables for a join.  Bucketing pays that cost ONCE
at write time: both tables are hash-partitioned into the same number of
buckets on the join key and each bucket is sorted, so every future join on
that key is a zero-exchange sort-merge over matching bucket files — the
lakehouse equivalent of a co-located MPP join.  (This is the batch answer
to the same problem the IVF tiers solve for vectors: move the partitioning
cost out of the query.)

Spark specifics encoded here:
- bucketed writes must go through ``saveAsTable`` (bucket metadata lives in
  the catalog, not the parquet files); an explicit ``path`` keeps the data
  external so tests and pipelines control the location;
- both sides must have the SAME bucket count (or a divisor, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the exchange
  to be elided;
- ``sortBy`` at write time additionally removes the per-task sort before
  the merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted table registered in the
    session catalog: hash-bucketed AND sorted by ``key`` so joins on the
    key skip both the exchange and the sort."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on ``key``.  With matching
    bucket specs the physical plan contains NO shuffle exchange — verified
    by tests/test_layout.py."""
    return spark.table(left_table).join(spark.table(right_table), key)
