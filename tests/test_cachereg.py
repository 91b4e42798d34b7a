"""Scoped cache ownership (VERDICT r7 #6): operator-internal persists are
registered at creation and released by ``hnsw_spark.release_caches()``
without touching caller-owned caches — the leak class was a long-lived
library session that never calls the global ``clearCache``."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnsw_spark import release_caches


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_frees_operator_internal_persists(spark):
    """Raw getPersistentRDDs() deltas race clearCache()'s NON-BLOCKING
    unpersist drain (VERDICT r13 #1: baseline captured mid-drain of other
    modules' session caches, before=26 -> after=7).  The contract under
    test — the operator registers its internal persist and release_caches
    frees exactly the registered handles — is pinned race-free via the
    registry and each handle's storageLevel mark, which persist/unpersist
    flip synchronously even though block eviction is async."""
    from hnsw_spark.operators.dedup import containment_pairs
    from hnsw_spark.plans import cachereg

    release_caches()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert len(cachereg._OWNED) == 0  # registry drained by the release
    containment_pairs(docs.filter(F.col("doc_id") < 60), n=3).collect()
    owned = list(cachereg._OWNED)
    assert len(owned) >= 1  # the internal persist was registered
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in owned)
    released = release_caches()
    assert released == len(owned)
    assert len(cachereg._OWNED) == 0
    # released handles are no longer marked persistent
    assert all(
        not (df.storageLevel.useMemory or df.storageLevel.useDisk) for df in owned
    )


def test_release_does_not_touch_caller_caches(spark):
    release_caches()
    spark.catalog.clearCache()
    mine = spark.range(1000).cache()
    mine.count()
    from hnsw_spark.operators.retrieval import phrase_match

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    phrase_match(docs, "the quick brown").collect()
    release_caches()
    # the caller's cache survives the scoped release
    assert mine.storageLevel.useMemory
    assert _persistent_rdd_count(spark) >= 1
    mine.unpersist(blocking=True)


def test_no_monotonic_growth_across_repeated_queries(spark):
    """The VERDICT done-criterion in miniature: repeated persist-bearing
    operator calls with a per-call release keep storage flat."""
    from hnsw_spark.operators.dedup import jaccard_prefix_pairs

    release_caches()
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # clearCache's unpersists are non-blocking: in a full-suite run the
    # baseline can be captured mid-drain of OTHER modules' session caches
    # and then drop below itself (observed 13 -> 7).  The property under
    # test is NO GROWTH, so the gate is <=, never ==.
    baseline = _persistent_rdd_count(spark)
    for _ in range(3):
        jaccard_prefix_pairs(docs.filter(F.col("doc_id") < 40), n=3).collect()
        release_caches()
        assert _persistent_rdd_count(spark) <= baseline
