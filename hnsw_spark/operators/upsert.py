"""CDC upsert / snapshot compaction: latest-version-wins merge.

The lakehouse maintenance primitive: a base snapshot plus a stream of
keyed updates/inserts compacts to a new snapshot where each key keeps its
highest-version row.  (Delta/Iceberg MERGE INTO does this transactionally;
the relational core is exactly this operator.)

Scale shape: union + one ranking window on (key) — a single shuffle on the
merge key, no join at all (a join formulation shuffles both sides AND
rebuilds rows; the union-window form treats base and delta uniformly and
scales to any number of stacked deltas).  The update stream is typically
≪ base, so at 100 TB the right physical variant partitions base and delta
the same way and relies on AQE to keep the window exchange as the only
data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key: str = "doc_id",
    version_col: str = "version",
) -> DataFrame:
    """Compact base ∪ updates to one row per key: highest ``version_col``
    wins; among equal versions the UPDATE side wins (side rank breaks the
    tie), matching MERGE semantics where a same-version re-write applies.

    Adds an ``action`` column to the survivors: ``inserted`` (key absent
    from base), ``updated`` (update row replaced a base row), or
    ``unchanged`` (base row survived).
    """
    b = base.withColumn("_side", F.lit(0))
    u = updates.withColumn("_side", F.lit(1))
    unioned = b.unionByName(u)
    w = Window.partitionBy(key).orderBy(
        F.desc(version_col), F.desc("_side")
    )
    ranked = unioned.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n_base", F.sum((F.col("_side") == 0).cast("int")).over(
            Window.partitionBy(key)
        )
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .withColumn(
            "action",
            F.when(F.col("_n_base") == 0, F.lit("inserted"))
            .when(F.col("_side") == 1, F.lit("updated"))
            .otherwise(F.lit("unchanged")),
        )
        .drop("_rn", "_side", "_n_base")
    )
