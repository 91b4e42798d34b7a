"""Scan-stage parallelism guard for per-row-heavy narrow plans.

An operator whose expensive work (tokenization, shingling, hashing,
chunking) happens BEFORE its first exchange is bounded by the file scan's
split count: a single small parquet file scans as one split, so the whole
pre-shuffle stage runs on one core no matter how wide the cluster is.  At
production scale a table scan carries thousands of splits and this is a
non-issue; on a small fixture (or any single-file input) it serializes the
hot path — measured 3× wall on the sf0.1 shingle join, whose per-row work
dominates.

``fan_out_narrow`` round-robins the RAW input rows up to core count when —
and only when — the plan is narrow (no Exchange) and under-split.  Narrow
probing matters: forcing ``.rdd`` under AQE materializes upstream query
stages when the plan contains an Exchange (measured: a groupBy base ran its
whole shuffle stage just to answer getNumPartitions), and post-shuffle
frames already carry shuffle-partitions-wide parallelism.  Round-robin
repartition moves the compact pre-explode rows (documents, not their
exploded shingles) and leaves per-row arithmetic bit-identical; it changes
no operator's results, only its task count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def narrow_partition_count(df: DataFrame) -> int | None:
    """Split count of a shuffle-free plan, or None when unknowable cheaply."""
    try:
        if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
            return None
        return df.rdd.getNumPartitions()
    except Exception:
        return None


def fan_out_narrow(df: DataFrame) -> DataFrame:
    """Repartition a narrow, under-split frame up to core count; identity
    for wide plans, already-parallel scans, and unprobeable plans."""
    target = df.sparkSession.sparkContext.defaultParallelism
    nparts = narrow_partition_count(df)
    if nparts is not None and nparts < target:
        return df.repartition(target)
    return df
