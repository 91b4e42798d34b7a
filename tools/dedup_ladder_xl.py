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
- the band-bucket table is materialized ONCE to band-partitioned parquet,
  and the signature pass itself is SHARDED into id-range slices
  (VERDICT r12 #3, `--slices N`): minhash signatures are per-document, so
  slicing is row-identical, and each slice's shuffle — the ~126 GB @ 100M
  transient floor the r12 record attributed to the one signature job —
  is capped at slice size, released (blocking shuffle cleanup + GC)
  before the next slice runs; the max_bucket cap moves to stage 2,
  applied per band (identical semantics — the cap key includes band_idx);
- each band then self-joins ALONE off a partition-pruned scan over the
  slice dirs, writing its pairs to its own candidate subdirectory in
  overwrite mode (idempotent on tool-level re-run, ADVICE r12 #4), with
  blocking shuffle cleanup forced between bands
  (`spark.cleaner.referenceTracking.blocking.shuffle` + a py4j
  System.gc() to trigger the ContextCleaner) so band b's shuffle files
  are gone before band b+1 shuffles;
- the cross-band distinct + the verify stage run over the (duplicate-
  density-sized) candidate parquet, never the corpus.

At 100 TB this IS the production shape: band-partitioned staging is how
the shuffle shards across executors, and the per-band working set is what
bounds per-executor scratch disk.

Usage: SPARK_DRIVER_MEM=48g python tools/dedup_ladder_xl.py [n_docs]
           [--staged] [--slices N]
       (default n_docs = 100_000_000; partitions scale as n/250k, min 32;
       slices default to one per 15M docs so a slice's signature shuffle
       stays near the measured ~15 GB transient)
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
    sig_slices: int = 1,
    docs_df=None,
    id_max: int | None = None,
) -> dict:
    from functools import reduce

    from pyspark.sql import DataFrame
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

    # docs_df: test hook — feed a custom corpus (e.g. one with an over-cap
    # bucket) instead of the synthetic generator; must be cheap to
    # regenerate (the staged plan never caches it).  id_max bounds the
    # slice ranges when doc_ids aren't 0..n_docs-1.
    docs = (
        docs_df
        if docs_df is not None
        else synthetic_documents(spark, n_docs, words_per_doc=30, seed=31)
    ).repartition(n_parts)
    id_hi = n_docs if id_max is None else id_max

    # stage 1 — the signature pass SHARDED into id-range slices (VERDICT
    # r12 #3): each slice's signature job shuffles only slice_size ×
    # num_perm longs, so the transient shuffle footprint — the ~126 GB @
    # 100M floor the r12 record attributed to the single signature job —
    # is capped at one slice's worth while the band-partitioned parquet
    # grows linearly but columnar-compressed and static.  Minhash
    # signatures are strictly per-document (explode → groupBy(id) with no
    # cross-doc state), so the slice union is row-identical to the one-job
    # pass.  The max_bucket cap is the ONLY global step; it moves to
    # stage 2, applied per band — identical semantics, since the cap key
    # (band_idx, band_key) never crosses bands.  Each slice writes to its
    # own subdirectory with mode=overwrite (ADVICE r12 #4: a re-run slice
    # or band is idempotent, never double-appended).
    sig_slices = max(1, sig_slices)
    bounds = [
        (id_hi * s // sig_slices, id_hi * (s + 1) // sig_slices)
        for s in range(sig_slices)
    ]
    slice_paths = [
        os.path.join(bucket_path, f"slice_{s}") for s in range(sig_slices)
    ]
    t0 = time.time()
    for s, (lo, hi) in enumerate(bounds):
        sdocs = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        lsh_band_buckets(
            sdocs, num_perm, bands, n, "text", "doc_id", 42,
            max_bucket=None,
        ).write.partitionBy("band_idx").mode("overwrite").parquet(
            slice_paths[s]
        )
        # release this slice's shuffle files before the next slice
        # shuffles: the ContextCleaner is GC-driven, so force one
        spark._jvm.System.gc()
        _note_disk()
        print(
            f"stage1 slice {s} [{lo},{hi}): {time.time() - t0:.1f}s cum"
            f" (free disk {_disk_free_gb(scratch)} GB)",
            flush=True,
        )
    sig_wall = time.time() - t0
    print(
        f"stage1 signatures+banding ({sig_slices} slice(s)): "
        f"{sig_wall:.1f}s (free disk {_disk_free_gb(scratch)} GB)",
        flush=True,
    )

    def _band_rows(bidx: int):
        """Band-pruned union scan across slice dirs, cap applied per band
        (over-cap band_keys are rare degenerate buckets → broadcast
        anti-join; the self-join's band_key shuffle is unaffected)."""
        bb = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p).filter(F.col("band_idx") == bidx)
                for p in slice_paths
            ],
        ).select("id", "band_key")
        if max_bucket is not None:
            overs = (
                bb.groupBy("band_key")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > max_bucket)
                .select("band_key")
            )
            bb = bb.join(F.broadcast(overs), "band_key", "left_anti")
        return bb

    # stage 2 — per-band self-join, shuffle released between bands
    t0 = time.time()
    per_band_walls = []
    for bidx in range(bands):
        tb = time.time()
        bb = _band_rows(bidx)
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
        # own subdirectory + overwrite: a tool-level band re-run replaces
        # its pairs instead of double-appending (ADVICE r12 #4)
        pairs_b.write.mode("overwrite").parquet(
            os.path.join(cand_path, f"band_{bidx}")
        )
        # release this band's shuffle files before the next band shuffles
        spark._jvm.System.gc()
        per_band_walls.append(round(time.time() - tb, 1))
        _note_disk()
        print(
            f"band {bidx}: {per_band_walls[-1]}s"
            f" (free disk {_disk_free_gb(scratch)} GB)",
            flush=True,
        )
    cand = (
        spark.read.parquet(
            *[os.path.join(cand_path, f"band_{b}") for b in range(bands)]
        )
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
        "plan": "staged (sliced signature pass to band-partitioned "
                "parquet, per-band cap + join, shuffle released between "
                "slices and bands, docs never cached)",
        "sig_slices": sig_slices,
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

    argv = sys.argv[1:]
    staged = "--staged" in argv
    sig_slices = 0
    if "--slices" in argv:
        sig_slices = int(argv[argv.index("--slices") + 1])
        del argv[argv.index("--slices") : argv.index("--slices") + 2]
    args = [a for a in argv if a != "--staged"]
    n_docs = int(args[0]) if args else 100_000_000
    if sig_slices <= 0:
        # default: cap each slice's signature shuffle near the measured
        # 15M-doc transient (~15 GB) so 60M+ fits this box's free disk
        sig_slices = max(1, n_docs // 15_000_000)
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
        out = dedup_ladder_staged(
            spark, n_docs, n_parts, sig_slices=sig_slices
        )
    else:
        out = bench._dedup_ladder(spark, n_docs, n_parts=n_parts)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
