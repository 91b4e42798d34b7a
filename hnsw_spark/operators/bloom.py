"""Bloom-filter semi-join reduction — the runtime-filter pattern that cuts
a 100 TB probe-side shuffle before it happens.

Spark's own runtime bloom filter (``spark.sql.optimizer.runtime.bloomFilter``)
applies the same idea inside AQE but its ``bloom_filter_agg`` expression is
not in the public function registry, and an optimizer-injected filter cannot
be oracle-checked.  This is the explicit, engine-portable version: k md5-seeded
hash positions per key, a bitmap of 32-bit words built with one ``bit_or``
aggregate over the (small) build side, broadcast as a single map literal, and
a pure scan-stage membership test on the probe side — the probe table is never
shuffled, re-read, or exploded to generate candidates.

Guarantees (classic Bloom semantics, verifiable row-for-row in SQL):
- no false negatives: every true match survives the filter;
- false positives bounded by (set_bits/m)^k, paid only in the exact join
  that follows the reduction — never silently kept.

Public construction (Bloom 1970; Spark runtime-filter design is public in
SPARK-32268).  No reference counterpart; beyond-reference scale operator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bitmap geometry: bits and md5-derived hash functions
DEFAULT_M_BITS = 32768
DEFAULT_K_HASHES = 4
_WORD = 32  # bits per bitmap word; BIGINT masks never touch the sign bit


def _bit_pos(key: Column, seed: int, m_bits: int) -> Column:
    """Portable hash position in [0, m_bits): md5 of ``key#seed`` — identical
    in Spark (``conv(hex,16,10)``) and DuckDB (``('0x'||hex)::BIGINT``)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m_bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """1-row DataFrame[(bitmap map<int,bigint>, n_set_bits int)] over the
    build side's keys.  Cost: one explode of k positions per build row, one
    ``bit_or`` shuffle of ≤ m_bits/32 skinny word rows — the build side is
    the SMALL side by contract, the probe side never appears here.

    NULL build keys are dropped up front (ADVICE r4): a NULL key hashes to
    a NULL position, which would surface as a NULL map key at
    ``map_from_entries`` and throw at runtime — and since a NULL key can
    never equi-join, dropping it preserves the no-false-negative contract.
    """
    keys = keys.filter(F.col(key_col).isNotNull())
    pos = keys.select(
        F.explode(
            F.array(*[_bit_pos(F.col(key_col), j, m_bits) for j in range(k_hashes)])
        ).alias("pos")
    )
    words = pos.select(
        F.floor(F.col("pos") / _WORD).cast("int").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % _WORD).cast("int")
        ).alias("mask"),
    ).groupBy("word_idx").agg(F.bit_or("mask").alias("word"))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("bitmap"),
        F.sum(F.bit_count("word")).cast("int").alias("n_set_bits"),
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Probe rows that MIGHT join (every one of their k bits set): the
    original columns, bloom columns dropped.  Scan-stage only — the bitmap
    rides in as a broadcast 1-row cross join, membership is k masked map
    lookups inside whole-stage codegen, and rows failing any bit never
    reach the join exchange."""
    checks = []
    for j in range(k_hashes):
        p = _bit_pos(F.col(key_col), j, m_bits)
        w = F.floor(p / _WORD).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % _WORD).cast("int")
        )
        word = F.coalesce(
            F.element_at(F.col("bitmap"), w), F.lit(0).cast("long")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    return (
        probe.crossJoin(F.broadcast(bloom))
        .filter(reduce(lambda a, b: a & b, checks))
        .drop("bitmap", "n_set_bits")
    )
