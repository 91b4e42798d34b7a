"""KMV corpus-overlap sketches: exact degeneration below k, estimate
accuracy against exact distinct counts/Jaccard at fixture scale, and the
bottom-k mergeability invariant the estimator relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.functions.hashing import md5_bigint
from hnsw_spark.operators.sketches import (
    kmv_corpus_overlap,
    kmv_distinct_estimate,
    kmv_sketch,
)


def _items(spark, values):
    return spark.createDataFrame([(v,) for v in values], "item string")


def test_exact_degeneration_below_k(spark):
    # distinct sets smaller than k: the sketch IS the distinct hash set,
    # so counts and Jaccard come back exact
    a = _items(spark, [f"x{i}" for i in range(30)] * 3)  # dups collapse
    b = _items(spark, [f"x{i}" for i in range(20, 50)])
    [row] = kmv_corpus_overlap(a, b, "item", k=256).collect()
    assert (row.n_sketch_a, row.n_sketch_b) == (30, 30)
    assert row.est_distinct_a == 30.0 and row.est_distinct_b == 30.0
    assert row.est_union == 50.0
    # |A ∩ B| = 10, |A ∪ B| = 50
    assert row.est_jaccard == pytest.approx(10 / 50)
    assert row.est_intersection == pytest.approx(10.0)


def test_sketch_is_bottom_k_distinct_and_deterministic(spark):
    vals = [f"v{i}" for i in range(500)]
    df = _items(spark, vals * 2).repartition(8)  # dups + many partitions
    k = 64
    got = [r.h for r in kmv_sketch(df, "item", k=k).collect()]
    exact = sorted(
        r.h for r in df.select(md5_bigint("item").alias("h")).distinct().collect()
    )[:k]
    assert sorted(got) == exact  # bottom-k of the TRUE distinct hash set
    again = [r.h for r in kmv_sketch(df, "item", k=k).collect()]
    assert sorted(again) == sorted(got)  # pure md5, no RNG


def test_mergeability_union_sketch_from_per_set_sketches(spark):
    # bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    # invariant that lets corpora be compared from summaries alone
    a = _items(spark, [f"a{i}" for i in range(300)])
    b = _items(spark, [f"b{i}" for i in range(300)])
    k = 32
    sa = {r.h for r in kmv_sketch(a, "item", k=k).collect()}
    sb = {r.h for r in kmv_sketch(b, "item", k=k).collect()}
    direct = [r.h for r in kmv_sketch(a.union(b), "item", k=k).collect()]
    assert sorted(sa | sb)[:k] == sorted(direct)


def test_estimates_close_to_exact_on_fixture_shingles(spark):
    # corpus-level overlap of the even vs odd halves of the documents
    # fixture, 3-gram shingles: KMV at k=256 must land within the
    # standard ~1/sqrt(k) relative band of the exact answers
    from hnsw_spark.operators.dedup import doc_shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = doc_shingles(docs, n=3).select("shingle")
    a = doc_shingles(docs.filter(F.col("doc_id") % 2 == 0), n=3).select("shingle")
    b = doc_shingles(docs.filter(F.col("doc_id") % 2 == 1), n=3).select("shingle")
    [row] = kmv_corpus_overlap(a, b, "shingle", k=256).collect()

    da = a.distinct().count()
    db = b.distinct().count()
    du = sh.distinct().count()
    inter = da + db - du
    j = inter / du
    tol = 3.0 / (256 ** 0.5)  # ~0.19 relative
    assert row.est_distinct_a == pytest.approx(da, rel=tol)
    assert row.est_distinct_b == pytest.approx(db, rel=tol)
    assert row.est_union == pytest.approx(du, rel=tol)
    assert row.est_jaccard == pytest.approx(j, abs=tol)


def test_null_items_are_excluded(spark):
    # md5(NULL) is NULL → NaN in the Arrow batch → schema corruption
    # (ADVICE r7); the sketch must be defined over non-NULL items only
    vals = [f"n{i}" for i in range(40)]
    with_nulls = _items(spark, vals).unionByName(
        spark.createDataFrame([(None,)] * 5, "item string")
    )
    got = sorted(r.h for r in kmv_sketch(with_nulls, "item", k=64).collect())
    clean = sorted(r.h for r in kmv_sketch(_items(spark, vals), "item", k=64).collect())
    assert got == clean and len(got) == 40


def test_distinct_estimator_formula():
    # full sketch: (k-1) * M / h_k
    k = 4
    vals = [10, 20, 30, 40]
    assert kmv_distinct_estimate(vals, k) == (k - 1) * float(1 << 60) / 40
    # under-full sketch: exact count
    assert kmv_distinct_estimate([7, 9], k) == 2.0


def test_streaming_kmv_matches_batch_and_survives_replay(spark, tmp_path):
    """Epoch-partitioned KMV deltas merged by distinct+bottom-k == the
    batch sketch over the same rows; an epoch replay (simulated retry)
    cannot perturb the sketch."""
    from hnsw_spark.streaming.sketch import StreamingKMV

    vals = [f"w{i}" for i in range(400)]
    skv = StreamingKMV(str(tmp_path / "kmv"), col="item", k=64)
    b1 = _items(spark, vals[:250])
    b2 = _items(spark, vals[250:] + vals[:50])  # overlap across epochs
    skv.process_batch(b1, 0)
    skv.process_batch(b2, 1)
    skv.process_batch(b2, 1)  # replayed epoch overwrites its own delta
    live = sorted(r.h for r in skv.sketch(spark).collect())
    whole = sorted(
        r.h for r in kmv_sketch(_items(spark, vals), "item", k=64).collect()
    )
    assert live == whole


def test_streaming_kmv_end_to_end_stream(spark, tmp_path):
    from hnsw_spark.streaming.sketch import StreamingKMV

    vals = [f"s{i}" for i in range(300)]
    src = str(tmp_path / "src")
    _items(spark, vals).coalesce(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    skv = StreamingKMV(str(tmp_path / "kmv"), col="item", k=32)
    q = skv.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    live = sorted(r.h for r in skv.sketch(spark).collect())
    whole = sorted(
        r.h for r in kmv_sketch(_items(spark, vals), "item", k=32).collect()
    )
    assert live == whole


def test_overlap_with_empty_corpus(spark):
    # a brand-new (empty) crawl vs an existing corpus: zero sketch on one
    # side, exact zero intersection, union == the non-empty side
    a = _items(spark, [f"e{i}" for i in range(40)])
    b = _items(spark, []).filter("item IS NOT NULL")
    [row] = kmv_corpus_overlap(a, b, "item", k=64).collect()
    assert (row.n_sketch_a, row.n_sketch_b) == (40, 0)
    assert row.est_distinct_b == 0.0
    assert row.est_union == 40.0
    assert row.est_jaccard == 0.0 and row.est_intersection == 0.0


def test_overlap_both_corpora_empty(spark):
    # degenerate edge: union sketch is empty, Jaccard undefined -> NULL
    # (not NaN), matching the SQL twin's CASE WHEN nu = 0 guard (ADVICE r8)
    a = _items(spark, []).filter("item IS NOT NULL")
    b = _items(spark, []).filter("item IS NOT NULL")
    [row] = kmv_corpus_overlap(a, b, "item", k=64).collect()
    assert (row.n_sketch_a, row.n_sketch_b) == (0, 0)
    assert row.est_union == 0.0
    assert row.est_jaccard is None and row.est_intersection is None
