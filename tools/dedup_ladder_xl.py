"""One-off probe: the banded-LSH near-dup ladder at an arbitrary decade —
the 100M point is VERDICT r10 #8, two decades above the per-round 1M cell
and one above `dedup_ladder_10m_recorded`.  Same pipeline end-to-end
(signature → banding → capped bucket join → exact verification of the
surviving candidates), same ledger: candidate pairs must track DUPLICATE
DENSITY (~n/10 planted pairs), never n², and wall must stay ~linear in n
(signature-stage-bound).

At 100M the naive all-pairs bound is 5×10¹⁵ pairs; the ladder should
shuffle ~10⁷ candidates — a 5×10⁸× reduction, one decade more than 10M's
5×10⁷×.  Results are recorded into bench.py's recorded axes with
measured_on provenance (a 100M generate+sign run costs ~2 h — strictly a
one-off; the 1M cell stays the per-round regression sentinel).

``--staged`` (VERDICT r11 #7): the round-11 100M attempt DIED ON DISK —
the one-job candidate plan retains the docs cache plus every banding/
bucket-join shuffle simultaneously (~62 GB observed at 30M, ~200 GB
extrapolated at 100M vs ~80 GB free).  The staged plan caps the transient
footprint near one band's working set:

- docs are NEVER cached — the generator is pure Catalyst expressions over
  ``spark.range``, so both consumers (signature pass, verify stage)
  regenerate instead of spilling a corpus-sized cache to disk;
- the band-bucket table is materialized ONCE to band-partitioned parquet
  (the signature stage — the dominant wall — still runs exactly once),
  sized ~rows×bands but columnar-compressed and static;
- each band then self-joins ALONE off a partition-pruned scan, appending
  its pairs to a candidates sink, with blocking shuffle cleanup forced
  between bands (`spark.cleaner.referenceTracking.blocking.shuffle` +
  a py4j System.gc() to trigger the ContextCleaner) so band b's shuffle
  files are gone before band b+1 shuffles;
- the cross-band distinct + the verify stage run over the (duplicate-
  density-sized) candidate parquet, never the corpus.

At 100 TB this IS the production shape: band-partitioned staging is how
the shuffle shards across executors, and the per-band working set is what
bounds per-executor scratch disk.

Usage: SPARK_DRIVER_MEM=48g python tools/dedup_ladder_xl.py [n_docs] [--staged]
       (default n_docs = 100_000_000; partitions scale as n/250k, min 32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _disk_free_gb(path: str = ".") -> float:
    st = os.statvfs(path)
    return round(st.f_bavail * st.f_frsize / 1e9, 1)


def dedup_ladder_staged(
    spark,
    n_docs: int,
    n_parts: int,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    max_bucket: int = 1000,
    scratch: str | None = None,
) -> dict:
    from pyspark.sql import functions as F

    from hnsw_spark.functions.text import shingles_w, words
    from hnsw_spark.operators.dedup import lsh_band_buckets
    from hnsw_spark.sources.synthetic import synthetic_documents

    scratch = scratch or os.path.join(".tmp", f"ladder_staged_{n_docs}")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    bucket_path = os.path.join(scratch, "buckets")
    cand_path = os.path.join(scratch, "cand")
    disk0 = _disk_free_gb(scratch)
    min_free = disk0

    def _note_disk():
        nonlocal min_free
        min_free = min(min_free, _disk_free_gb(scratch))

    docs = synthetic_documents(
        spark, n_docs, words_per_doc=30, seed=31
    ).repartition(n_parts)

    # stage 1 — ONE signature pass, materialized band-partitioned: the
    # dominant wall runs once; the parquet is static (no shuffle-file
    # retention) and band-pruned reads feed stage 2
    t0 = time.time()
    lsh_band_buckets(
        docs, num_perm, bands, n, "text", "doc_id", 42, max_bucket
    ).write.partitionBy("band_idx").mode("overwrite").parquet(bucket_path)
    sig_wall = time.time() - t0
    _note_disk()
    print(
        f"stage1 signatures+banding: {sig_wall:.1f}s"
        f" (free disk {_disk_free_gb(scratch)} GB)",
        flush=True,
    )

    # stage 2 — per-band self-join, shuffle released between bands
    t0 = time.time()
    per_band_walls = []
    for bidx in range(bands):
        tb = time.time()
        bb = spark.read.parquet(bucket_path).filter(
            F.col("band_idx") == bidx
        )
        a, b = bb.alias("a"), bb.alias("b")
        pairs_b = (
            a.join(
                b,
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        )
        pairs_b.write.mode("append").parquet(cand_path)
        # release this band's shuffle files before the next band shuffles:
        # the ContextCleaner is GC-driven, so drop the refs and force one
        spark._jvm.System.gc()
        per_band_walls.append(round(time.time() - tb, 1))
        _note_disk()
        print(
            f"band {bidx}: {per_band_walls[-1]}s"
            f" (free disk {_disk_free_gb(scratch)} GB)",
            flush=True,
        )
    cand = (
        spark.read.parquet(cand_path)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .cache()
    )
    n_cand = cand.count()
    cand_wall = sig_wall + (time.time() - t0)
    _note_disk()

    # stage 3 — exact verification over candidates only; docs REGENERATED
    t0 = time.time()
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    arrays = (
        docs.join(ids, "doc_id")
        .select(
            "doc_id",
            F.array_distinct(shingles_w(words("text"), n)).alias("_sh"),
        )
        .withColumn("size", F.size("_sh"))
    )
    ver = (
        cand.join(
            arrays.select(
                F.col("doc_id").alias("id_a"),
                F.col("_sh").alias("_sha"),
                F.col("size").alias("sa"),
            ),
            "id_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("id_b"),
                F.col("_sh").alias("_shb"),
                F.col("size").alias("sb"),
            ),
            "id_b",
        )
        .withColumn("nc", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "j", F.col("nc") / (F.col("sa") + F.col("sb") - F.col("nc"))
        )
    )
    n_dup = ver.filter(F.col("j") >= 0.8).count()
    verify_wall = time.time() - t0
    _note_disk()
    cand.unpersist()
    bucket_gb = round(
        sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(bucket_path)
            for f in fs
        )
        / 1e9,
        2,
    )
    shutil.rmtree(scratch, ignore_errors=True)
    quad = n_docs * (n_docs - 1) // 2
    return {
        "n_docs": n_docs,
        "num_perm": num_perm,
        "bands": bands,
        "max_bucket": max_bucket,
        "plan": "staged (band-partitioned parquet, per-band join, "
                "shuffle released between bands, docs never cached)",
        "signature_wall_s": round(sig_wall, 2),
        "per_band_join_walls_s": per_band_walls,
        "candidate_wall_s": round(cand_wall, 2),
        "verify_wall_s": round(verify_wall, 2),
        "n_candidate_pairs": n_cand,
        "n_verified_ge_080": n_dup,
        "quadratic_bound_pairs": quad,
        "candidate_reduction_x": round(quad / max(n_cand, 1)),
        "docs_per_s_end_to_end": round(n_docs / (cand_wall + verify_wall)),
        "bucket_parquet_gb": bucket_gb,
        "peak_scratch_use_gb_observed": round(disk0 - min_free, 1),
    }


def main() -> None:
    import bench
    from hnsw_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--staged"]
    staged = "--staged" in sys.argv
    n_docs = int(args[0]) if args else 100_000_000
    n_parts = max(32, min(512, n_docs // 250_000))
    spark = get_spark(
        app_name="dedup_ladder_xl", master="local[32]",
        shuffle_partitions=max(64, n_parts),
        extra_conf={
            "spark.cleaner.referenceTracking.blocking.shuffle": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if staged:
        out = dedup_ladder_staged(spark, n_docs, n_parts)
    else:
        out = bench._dedup_ladder(spark, n_docs, n_parts=n_parts)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
