"""Physical-layout strategies: bucketed joins plan without a shuffle;
salted joins return identical results while splitting hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.plans.layout import (
    explain_has_exchange_above_scan,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    # managed tables land in the session warehouse; DROP TABLE removes them
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 10000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("w")
    )
    write_bucketed(left, "t_left_b", ["k"], n_buckets=8)
    write_bucketed(right, "t_right_b", ["k"], n_buckets=8)
    # disable broadcast so the join must co-locate by key — the case where
    # bucketing saves the shuffle (at 100 TB neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_left_b")
        b = spark.table("t_right_b")
        joined = a.join(b, "k")
        # co-located buckets: no Exchange anywhere in the join plan
        assert not explain_has_exchange_above_scan(joined)
        assert joined.count() == 3334
        # the same join on unbucketed frames DOES shuffle (sanity of the probe)
        plain = left.join(right.withColumnRenamed("w", "w2"), "k")
        assert explain_has_exchange_above_scan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_left_b")
        spark.sql("DROP TABLE IF EXISTS t_right_b")


def test_salted_join_matches_plain_join(spark):
    # one pathological hot key (0) + a long tail
    skewed = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    plain = skewed.join(dim, "k").select("k", "payload", "attr")
    salted = salted_join(skewed, dim, "k", n_salts=4).select("k", "payload", "attr")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark):
    skewed = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0, 50).select(F.col("id").alias("k"), F.lit(1).alias("m"))
    out = salted_join(skewed, dim, "k", n_salts=3, how="left")
    assert out.count() == 100
    assert out.filter(F.col("m").isNull()).count() == 50


def test_sorted_export_total_order_and_conservation(spark, tmp_path):
    from pyspark.sql import functions as F

    from hnsw_spark.operators.packing import sorted_export, sorted_export_gate

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 101).alias("k"),
    )
    gate = sorted_export_gate(df, "k", 6, id_col="doc_id").collect()[0]
    assert gate.n_rows == 2000
    assert gate.within_sorted and gate.ranges_disjoint

    # written form: reading part dirs in order yields the global sort
    path = str(tmp_path / "sorted")
    sorted_export(df, "k", 4, path=path, id_col="doc_id")
    back = spark.read.parquet(path)
    rows = [
        (r.part_id, r.k, r.doc_id)
        for r in back.orderBy("part_id", "k", "doc_id").collect()
    ]
    keys = [(k, d) for _, k, d in rows]
    assert keys == sorted(keys)
    assert len(rows) == 2000


def test_bucketed_join_has_no_shuffle_exchange(spark, tmp_path):
    """Same-bucketed tables join with ZERO exchanges (the write paid the
    shuffle once); results match a plain join."""
    from pyspark.sql import functions as F

    from hnsw_spark.sources.bucketed import bucketed_join, write_bucketed

    left = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("a")
    )
    right = spark.range(0, 5000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b")
    )
    write_bucketed(left, "t_bleft", str(tmp_path / "bl"), "k", buckets=8)
    write_bucketed(right, "t_bright", str(tmp_path / "br"), "k", buckets=8)
    try:
        # force the large-table path: no broadcast fallback
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "t_bleft", "t_bright", "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 2500
        # parity with the plain (shuffling) join
        plain = left.join(right, "k")
        assert sorted((r.k, r.a, r.b) for r in j.collect()) == sorted(
            (r.k, r.a, r.b) for r in plain.collect()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


def test_schema_evolution_merge_read(spark, tmp_path):
    """mergeSchema read across files written before/after a column was
    added — the schema-drift survival path for long-lived tables."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(10).select(F.col("id").alias("doc_id")).write.parquet(
        path + "/p=1"
    )
    spark.range(10, 20).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.parquet(path + "/p=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) >= {"doc_id", "lang"}
    rows = merged.orderBy("doc_id").collect()
    assert len(rows) == 20
    assert rows[0].lang is None and rows[-1].lang == "en"


def test_zorder_layout_prunes_2d_boxes_better_than_1d_sort(spark, tmp_path):
    """Footer-manifest proof that z-ordering buys 2-d pruning: for a box
    predicate on (x, y), the z-ordered layout leaves fewer candidate files
    than a layout sorted on x alone — and both return identical rows."""
    from pyspark.sql import functions as F

    from hnsw_spark.functions.zorder import write_zordered, z_value
    from hnsw_spark.sources.metadata import rowgroup_stats

    df = (
        spark.range(40_000)
        .select(
            F.col("id"),
            ((F.col("id") * 48271) % 1024).alias("x"),
            ((F.col("id") * 69621) % 1024).alias("y"),
        )
    )
    p_x = str(tmp_path / "xsorted")
    df.repartitionByRange(32, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(p_x)
    p_z = str(tmp_path / "zordered")
    write_zordered(df, p_z, "x", "y", num_files=32, bits=10)

    def candidates(path):
        sx = {r.file: (r.stat_min, r.stat_max)
              for r in rowgroup_stats(spark, path, "x").collect()}
        sy = {r.file: (r.stat_min, r.stat_max)
              for r in rowgroup_stats(spark, path, "y").collect()}
        # box: x in [0, 511] (wide - half the domain), y in [300, 400]
        # (narrow).  A 1-d x-sort can only halve the files; interleaving
        # lets the y constraint prune too
        return {
            f for f in sx
            if not (sx[f][1] < 0 or sx[f][0] > 511)
            and not (sy[f][1] < 300 or sy[f][0] > 400)
        }

    cand_x, cand_z = candidates(p_x), candidates(p_z)
    assert len(cand_z) < len(cand_x)

    box = (F.col("x").between(0, 511)) & (F.col("y").between(300, 400))
    rows_x = {r.id for r in spark.read.parquet(p_x).filter(box).collect()}
    rows_z = {r.id for r in spark.read.parquet(p_z).filter(box).collect()}
    assert rows_x == rows_z and len(rows_x) > 0


def test_z_value_interleaves_bits(spark):
    from pyspark.sql import functions as F

    from hnsw_spark.functions.zorder import z_value

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(z_value("a", "b", bits=3).alias("z")).first().z
    # a bits at even positions: 1,0,1 -> 1 + 0 + 16; b bits at odd: 1,1,0 -> 2 + 8
    assert got == (1 + 16) + (2 + 8)
