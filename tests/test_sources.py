"""Tests for fvecs/ivecs decoding, synthetic generation, and level sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.levels import level_probs, select_level
from hnsw_spark.sources.fvecs import (
    decode_fvecs,
    read_fvecs,
    read_ivecs_as_float,
    write_fvecs,
)
from hnsw_spark.sources.synthetic import synthetic_vectors


def test_fvecs_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 8)).astype(np.float32)
    path = str(tmp_path / "v.fvecs")
    write_fvecs(path, mat)
    df = read_fvecs(spark, path).orderBy("vec_id")
    rows = df.collect()
    assert len(rows) == 50
    got = np.array([r.embedding for r in rows], dtype=np.float32)
    np.testing.assert_array_equal(got, mat)


def test_fvecs_limit_offset_pushdown(spark, tmp_path):
    mat = np.arange(40, dtype=np.float32).reshape(10, 4)
    path = str(tmp_path / "lo.fvecs")
    write_fvecs(path, mat)
    rows = read_fvecs(spark, path, limit=3, offset=2).orderBy("vec_id").collect()
    # reference semantics (dataset.ts:87-88): ids keep absolute positions
    assert [r.vec_id for r in rows] == [2, 3, 4]
    assert rows[0].embedding == [8.0, 9.0, 10.0, 11.0]


def test_ivecs_as_float(spark, tmp_path):
    mat = np.arange(12, dtype="<i4").reshape(3, 4)
    out = np.empty((3, 5), dtype="<i4")
    out[:, 0] = 4
    out[:, 1:] = mat
    path = str(tmp_path / "v.ivecs")
    with open(path, "wb") as f:
        f.write(out.tobytes())
    rows = read_ivecs_as_float(spark, path).orderBy("vec_id").collect()
    assert rows[1].embedding == [4.0, 5.0, 6.0, 7.0]


def test_decode_rejects_corrupt(spark):
    with pytest.raises(ValueError, match="corrupt|invalid"):
        decode_fvecs(b"\x04\x00\x00\x00" + b"\x00" * 7)  # truncated record


def test_synthetic_deterministic_and_partition_invariant(spark):
    a = synthetic_vectors(spark, 100, 8, seed=42)
    b = synthetic_vectors(spark, 100, 8, seed=42).repartition(7)
    pa = {r.vec_id: r.embedding for r in a.collect()}
    pb = {r.vec_id: r.embedding for r in b.collect()}
    assert pa == pb  # same seed → same vectors under any partitioning
    c = {r.vec_id: r.embedding for r in synthetic_vectors(spark, 100, 8, seed=1).collect()}
    assert pa[0] != c[0]  # different seed → different data
    vals = np.array(list(pa.values()))
    assert vals.min() >= -1.0 and vals.max() < 1.0


def test_synthetic_gaussian_moments(spark):
    df = synthetic_vectors(spark, 2000, 8, seed=42, distribution="gaussian")
    flat = np.concatenate([r.embedding for r in df.collect()])
    assert abs(flat.mean()) < 0.02
    assert abs(flat.std() - 1.0) < 0.02


def test_level_probs_sum_and_distribution(spark):
    probs = level_probs(16)
    assert sum(probs) == pytest.approx(1.0, abs=1e-6)
    assert probs[0] == pytest.approx(1 - 1 / 16, rel=1e-9)  # P(level 0) = 1 − 1/M
    df = spark.range(20000).withColumn("level", select_level("id", m=16, seed=42))
    hist = {r.level: r["count"] for r in df.groupBy("level").count().collect()}
    assert hist[0] / 20000 == pytest.approx(probs[0], abs=0.01)
    assert hist[1] / 20000 == pytest.approx(probs[1], abs=0.01)


def test_stream_fvecs_incremental(spark, tmp_path):
    # S4: vectors land file-by-file; the stream decodes each arrival and the
    # accumulated set matches a batch read of the same directory.
    import numpy as np

    from hnsw_spark.sources.fvecs import read_fvecs, stream_fvecs, write_fvecs

    src = tmp_path / "stream_src"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        write_fvecs(str(src / f"part{i}.fvecs"), rng.normal(size=(5, 4)))
    stream = stream_fvecs(spark, str(src))
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("fvecs_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select path, vec_id, embedding from fvecs_stream"
        ).collect()
    finally:
        q.stop()
    want = read_fvecs(spark, str(src)).collect()
    key = lambda r: (r.path, r.vec_id, tuple(r.embedding))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 15


def test_synthetic_documents_deterministic_with_planted_dups(spark):
    from hnsw_spark.operators.dedup import exact_dedup
    from hnsw_spark.sources.synthetic import synthetic_documents

    docs = synthetic_documents(spark, 200, words_per_doc=12, seed=6, dup_every=10)
    again = synthetic_documents(spark, 200, words_per_doc=12, seed=6, dup_every=10)
    assert docs.orderBy("doc_id").collect() == again.orderBy("doc_id").collect()
    # every 10th doc (>= 10) repeats an earlier doc: 19 planted duplicates
    groups = exact_dedup(docs)
    dup_groups = groups.filter("n_copies > 1")
    assert dup_groups.count() == 19
    assert groups.agg({"n_copies": "sum"}).first()[0] == 200
    # partition-invariance: the corpus is identical under a different layout
    re = synthetic_documents(spark, 200, words_per_doc=12, seed=6, dup_every=10)
    assert (
        re.repartition(7).orderBy("doc_id").collect()
        == docs.orderBy("doc_id").collect()
    )


def test_rowgroup_stats_multifile_dir(spark, tmp_path):
    """Footer manifest covers every file/row-group of a multi-file table
    and matches the exact per-group recomputation."""
    from pyspark.sql import functions as F

    from hnsw_spark.sources.metadata import rowgroup_exact_stats, rowgroup_stats

    path = str(tmp_path / "multi")
    spark.range(1000).withColumn("v", (F.col("id") % 97).cast("double")).repartition(
        4
    ).write.parquet(path)
    footer = rowgroup_stats(spark, path, "v")
    exact = rowgroup_exact_stats(spark, path, "v")
    f = {(r.file, r.row_group): (r.num_rows, r.stat_min, r.stat_max)
         for r in footer.collect()}
    e = {(r.file, r.row_group): (r.num_rows, r.stat_min, r.stat_max)
         for r in exact.collect()}
    assert f == e and len(f) >= 4
    assert sum(v[0] for v in f.values()) == 1000


def test_rowgroup_stats_missing_path_raises(spark, tmp_path):
    import pytest as _pytest

    from hnsw_spark.sources.metadata import rowgroup_stats

    with _pytest.raises(FileNotFoundError):
        rowgroup_stats(spark, str(tmp_path / "nope"), "v")


def test_jsonl_permissive_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from hnsw_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "{truncated garbage\n"
        '{"doc_id": "not-a-number", "text": "type drift"}\n'
        '{"doc_id": 3, "text": "fine"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = read_jsonl(spark, str(p), schema)
    clean, quarantine = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2, 3}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("truncated" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_jsonl_roundtrip_matches_parquet_fixture(spark, tmp_path):
    """documents written as JSONL and read back with the explicit schema
    equal the parquet original."""
    from hnsw_spark.sources.jsonl import read_jsonl, split_corrupt
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    back = read_jsonl(spark, out, docs.schema)
    clean, quarantine = split_corrupt(back)
    assert quarantine.count() == 0
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in clean.select(*docs.columns).collect()}
    assert a == b


def test_split_corrupt_persist_is_library_owned(spark, tmp_path):
    """split_corrupt's internal persist registers with cachereg so
    release_caches() frees it (ADVICE r8) — a long-lived session never
    accumulates parse caches."""
    from hnsw_spark import release_caches
    from hnsw_spark.plans.cachereg import _OWNED
    from hnsw_spark.sources.jsonl import read_jsonl, split_corrupt
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "a"}\n')
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    release_caches()  # drain anything earlier tests left behind
    clean, quarantine = split_corrupt(read_jsonl(spark, str(p), schema))
    assert len(_OWNED) == 1
    assert clean.count() == 1 and quarantine.count() == 0
    assert release_caches() == 1 and not _OWNED
