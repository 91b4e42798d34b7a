"""Mergeable frequency sketches: Misra-Gries heavy hitters.

Training-data-pipeline surface: finding dominant tokens / URLs / domains
in one pass without a full groupBy is the standard first look at a new
100 TB crawl.  Misra-Gries summaries are mergeable with total error
bounded by N/(k+1) (Misra & Gries 1982; Agarwal et al., "Mergeable
summaries", PODS 2012 — public knowledge), which is what makes the
map-side-summary → merge shape work on Spark.

Scale design
------------
One pass: ``mapInPandas`` builds a ≤k-entry summary per partition
(per-batch counting runs in C via pandas ``value_counts``; compaction
subtracts the (k+1)-th largest count from every entry and drops the
non-positives, the bulk form of the MG decrement — each compaction
removes ≥ (k+1)·sub total mass, so the summed subtractions, and with
them every entry's undercount, stay ≤ N/(k+1)).  The merge is a groupBy
over ≤ partitions·k rows — vocabulary-scale, not corpus-scale — followed
by one final compaction expressed as a window over that tiny frame.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _compact(counts: dict, k: int) -> dict:
    if len(counts) <= k:
        return counts
    sub = sorted(counts.values(), reverse=True)[k]
    return {t: c - sub for t, c in counts.items() if c > sub}


def misra_gries(items: DataFrame, col: str = "token", k: int = 200) -> DataFrame:
    """≤k-row heavy-hitter summary of ``items[col]``.

    Returns DataFrame[token STRING, est BIGINT]: est ≤ true count and
    true − est ≤ N/(k+1), so every item with true count > N/(k+1) is
    present.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            for tok, n in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(n)
            counts = _compact(counts, k)
        yield pd.DataFrame(
            {"token": list(counts.keys()), "est": list(counts.values())}
        ).astype({"token": str, "est": "int64"})

    parts = items.select(F.col(col).alias(col)).mapInPandas(
        summarize, "token string, est bigint"
    )
    merged = parts.groupBy("token").agg(F.sum("est").alias("est"))
    # final compaction on the vocabulary-sized merged frame
    w = Window.orderBy(F.desc("est"), F.asc("token"))
    ranked = merged.withColumn("_r", F.row_number().over(w))
    sub = ranked.filter(F.col("_r") == k + 1).select(
        F.col("est").alias("_sub")
    )
    return (
        ranked.crossJoin(F.broadcast(sub.groupBy().agg(F.coalesce(F.max("_sub"), F.lit(0)).alias("_sub"))))
        .filter(F.col("est") > F.col("_sub"))
        .filter(F.col("_r") <= k)
        .select("token", (F.col("est") - F.col("_sub")).alias("est"))
    )


def hll_registers(
    df: DataFrame, col: str, b: int = 8
) -> DataFrame:
    """HyperLogLog registers over a column, from first principles (Flajolet
    et al. 2007 — public method): md5-derived 32-bit hash, first ``b`` bits
    pick one of m = 2^b registers, the register keeps the max over
    ρ = (leading zeros of the remaining 32 bits) + 1.

    DataFrame[(bucket int, rho int)] — only OCCUPIED registers appear.
    Because the hash is md5 (not a JVM-private hash), any engine rebuilds
    the IDENTICAL register array from the same rows: the sketch itself is
    oracle-checkable, not just its estimate.  The groupBy-max construction
    IS the HLL merge operator — per-partition partial maxes combine
    map-side, so the shuffle carries ≤ m rows per partition no matter how
    many rows are scanned, the property that makes one pass over 100 TB
    cheap.

    ρ is computed integer-exactly: for the 32-bit remainder r > 0,
    floor(log2(r)) + 1 == length(bin(r)) — a string length, no float log —
    so ρ = 32 - length(bin(r)) + 1, and r = 0 → ρ = 33.
    """
    assert b % 4 == 0, "b must be a whole number of hex digits"
    nb = b // 4
    # hex-string slicing keeps the split engine-portable with zero integer
    # gymnastics: the first b bits are the bucket, the next 32 the rho field
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, nb), 16, 10).cast("int")
    rest = F.conv(F.substring(h, nb + 1, 8), 16, 10).cast("long")
    # floor(log2(r)) + 1 == length of the minimal binary string (Spark's
    # bin() never pads; the DuckDB oracle ltrims its own bin output)
    nbits = F.length(F.bin(F.col("_rest")))
    rho = F.when(F.col("_rest") == 0, F.lit(33)).otherwise(F.lit(33) - nbits)
    return (
        df.select(bucket.alias("bucket"), rest.alias("_rest"))
        .select("bucket", rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    df: DataFrame, col: str, b: int = 8, scale: int = 4
) -> DataFrame:
    """One-row HLL cardinality estimate with the exactness audit built in:
    DataFrame[(n_exact, n_occupied, est_fp, within_bound)].

    ``est_fp`` is the raw HLL estimator αₘ·m²/Σ2^(-ρⱼ) (empty registers
    contribute 2⁰; linear-counting small-range correction applied below
    2.5m when registers are empty), quantized to 10⁻ˢ fixed point.  The
    harmonic sum is engine-invariant by construction: every term is the
    exact dyadic 1/(1<<ρ), and with ρ ≤ 33 all partial sums stay inside
    one 53-bit window, so the double is bit-identical at any partitioning
    or engine.  ``within_bound`` checks |est−exact| ≤ 3·(1.04/√m)·exact —
    the 3σ envelope of the published estimator.  ``n_exact`` costs one
    exact count_distinct and exists only for the audit; the 100 TB caller
    reads the sketch alone.
    """
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, col, b)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_occupied"),
        F.sum(
            F.lit(1.0)
            / F.call_function("shiftleft", F.lit(1).cast("long"), F.col("rho"))
        ).alias("_s_occ"),
    )
    exact = df.agg(F.count_distinct(F.col(col)).alias("n_exact"))
    est_raw = (F.lit(alpha * m * m)) / (
        F.col("_s_occ") + (F.lit(m) - F.col("n_occupied"))  # empty regs: 2^0
    )
    n_empty = F.lit(m) - F.col("n_occupied")
    # linear counting below 2.5m when some register is empty
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty),
    ).otherwise(est_raw)
    q = F.floor(est * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")
    out = exact.crossJoin(F.broadcast(agg)).select(
        "n_exact",
        "n_occupied",
        q.alias("est_fp"),
        (
            F.abs(est - F.col("n_exact"))
            <= F.lit(3.0 * 1.04) / F.lit(float(m) ** 0.5) * F.col("n_exact")
        ).alias("within_bound"),
    )
    return out


def _cm_col(col: str, seed: int, width: int):
    h = F.md5(F.concat(F.col(col).cast("string"), F.lit(f"@{seed}")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast(
        "int"
    )


def count_min_counters(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch counters over a column (Cormode & Muthukrishnan
    2005 — public method): ``depth`` md5-seeded hash rows of ``width``
    counters each; counter (r, c) = number of input rows whose r-th hash
    lands in column c.  DataFrame[(row int, col int, cnt bigint)] — only
    non-zero counters appear.

    Like ``hll_registers``, the hashes are md5, so any engine rebuilds the
    IDENTICAL counter table from the same rows — the sketch is
    hash-checkable, not just its error bound.  The groupBy-sum build is
    the CM merge operator (sketches add cell-wise): per-partition partial
    counts combine map-side and the shuffle carries ≤ depth·width rows per
    partition regardless of scan size — the one-pass 100 TB shape shared
    by the whole sketch family here (Misra-Gries, HLL, CM).
    """
    # ONE scan: posexplode an array of the depth column hashes — a
    # per-seed union would re-read the corpus depth times
    cells = df.select(
        F.posexplode(
            F.array(*[_cm_col(col, r, width) for r in range(depth)])
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    df: DataFrame,
    probes: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` values from a CM
    sketch of ``df[col]``: est = min over the depth rows of the probed
    counter.  DataFrame[(col, est bigint)].  One-sided by construction
    (est ≥ true count); overshoot ≤ e·N/width with probability
    1 − e^-depth.  The probe side is broadcast against the ≤ depth·width
    counter table — neither the corpus nor the sketch re-shuffles."""
    counters = count_min_counters(df, col, width, depth)
    cells = probes.select(
        F.col(col),
        F.posexplode(
            F.array(*[_cm_col(col, r, width) for r in range(depth)])
        ).alias("row", "col_idx"),
    )
    joined = cells.join(
        counters.withColumnRenamed("col", "col_idx"),
        ["row", "col_idx"],
        "left",
    ).select(col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy(col).agg(F.min("cnt").alias("est"))


def hll_estimate_by(
    df: DataFrame,
    group_col: str,
    col: str,
    b: int = 8,
    scale: int = 4,
) -> DataFrame:
    """Per-group HLL cardinality — approx-count-distinct as a GROUPED
    mergeable sketch: registers keyed by (group, bucket), one groupBy-max
    build, estimates per group.  DataFrame[(group_col, n_exact,
    n_occupied, est_fp, within_bound)].  This is the shape that answers
    "distinct users per segment over 100 TB" in one pass with
    groups·m rows of state; the exact count rides along as the audit
    (same contract as ``hll_estimate``)."""
    assert b % 4 == 0, "b must be a whole number of hex digits"
    m = 1 << b
    nb = b // 4
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, nb), 16, 10).cast("int")
    rest = F.conv(F.substring(h, nb + 1, 8), 16, 10).cast("long")
    nbits = F.length(F.bin(F.col("_rest")))
    rho = F.when(F.col("_rest") == 0, F.lit(33)).otherwise(F.lit(33) - nbits)
    regs = (
        df.select(
            F.col(group_col), bucket.alias("bucket"), rest.alias("_rest")
        )
        .select(group_col, "bucket", rho.cast("int").alias("rho"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    agg = regs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_occupied"),
        F.sum(
            F.lit(1.0)
            / F.call_function("shiftleft", F.lit(1).cast("long"), F.col("rho"))
        ).alias("_s_occ"),
    )
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(col)).alias("n_exact")
    )
    est_raw = F.lit(alpha * m * m) / (
        F.col("_s_occ") + (F.lit(m) - F.col("n_occupied"))
    )
    n_empty = F.lit(m) - F.col("n_occupied")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (n_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_empty),
    ).otherwise(est_raw)
    q = F.floor(est * F.lit(float(10**scale)) + F.lit(0.5)).cast("long")
    return exact.join(agg, group_col).select(
        group_col,
        "n_exact",
        "n_occupied",
        q.alias("est_fp"),
        (
            F.abs(est - F.col("n_exact"))
            <= F.lit(3.0 * 1.04) / F.lit(float(m) ** 0.5) * F.col("n_exact")
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches and corpus-level overlap
# --------------------------------------------------------------------------

_KMV_SPACE = float(1 << 60)  # md5_bigint hash space (60 bits)


def kmv_sketch(items: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The ``k`` smallest DISTINCT 60-bit hashes of ``items[col]`` —
    DataFrame[(h BIGINT)], ≤ k rows, ascending-unique.

    KMV/bottom-k synopses (Bar-Yossef et al. 2002; Beyer et al.,
    SIGMOD'07 "On synopses for distinct value estimation" — public
    knowledge) are the mergeable constant-size summary for distinct
    counts AND set overlap: bottom-k of a union equals bottom-k of the
    merged per-set sketches, so two corpora can be compared from their
    k-value summaries alone, without ever co-shuffling them.

    Scale shape: one corpus scan; each partition keeps its own ≤ k
    smallest distinct hashes inside ``mapInPandas`` (numpy unique on the
    Arrow batch — no corpus-wide distinct(), whose shuffle would defeat
    the sketch); the merge input is ≤ partitions·k rows, sketch-scale,
    not corpus-scale.  Deterministic: pure md5, no RNG."""
    import numpy as np

    from hnsw_spark.functions.hashing import md5_bigint

    # NULL items carry no identity and must not enter the sketch: md5(NULL)
    # is NULL, which reaches mapInPandas as NaN in a float64 column and
    # would corrupt the declared `h long` schema (ADVICE r7).  The sketch
    # is defined over non-NULL items only.
    h = items.filter(F.col(col).isNotNull()).select(md5_bigint(col).alias("h"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: np.ndarray | None = None
        for pdf in batches:
            vals = pdf["h"].to_numpy()
            cand = (
                np.unique(vals)
                if best is None
                else np.unique(np.concatenate([best, vals]))
            )
            best = cand[:k]  # np.unique returns ascending
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    partials = h.mapInPandas(partial, "h long")
    return partials.distinct().orderBy("h").limit(k)


def kmv_distinct_estimate(sketch_values: list[int], k: int) -> float:
    """Unbiased KMV distinct estimate from a sketch's values: exact when
    the sketch is not full (it IS the distinct hash set), else
    (k−1)·M/h_k (Beyer et al. 2007)."""
    if len(sketch_values) < k:
        return float(len(sketch_values))
    return (k - 1) * _KMV_SPACE / float(max(sketch_values))


def kmv_corpus_overlap(
    items_a: DataFrame,
    items_b: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """Corpus-level overlap report between two item sets (e.g. the
    distinct shingles of an existing corpus vs a new crawl) from their
    KMV sketches: 1-row DataFrame
    (k_used, n_sketch_a, n_sketch_b, est_distinct_a, est_distinct_b,
    est_union, est_jaccard, est_intersection).

    This is the dataset-level twin of the document-level dedup ladder —
    the "how much of this new crawl have I already got?" number read
    BEFORE paying for pairwise dedup.  Estimator: Ĵ = |K∪ ∩ A ∩ B| / |K∪|
    with K∪ = bottom-k of the merged sketches (the standard KMV set
    operation); when both sketches are below k the answer degenerates to
    the EXACT distinct-hash Jaccard.

    Scale shape: one scan per corpus (the two sketches), then O(k)
    driver-side set arithmetic — the two corpora are never co-shuffled,
    never joined, and only ≤ 2k BIGINTs ever reach the driver (a bounded
    scalar collect, the same budget class as a convergence flag).  Raw
    doubles out (oracle-facing callers quantize)."""
    spark = items_a.sparkSession
    # the two sketch jobs are independent — submit both so the second
    # job's tasks back-fill executors freed by the first job's tail
    # (guide §2.6 overlap; job-description thread-locals are per-thread,
    # so labels stay correct)
    from concurrent.futures import ThreadPoolExecutor

    def _collect(items: DataFrame) -> list:
        return sorted(r["h"] for r in kmv_sketch(items, col, k).collect())

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa, fb = pool.submit(_collect, items_a), pool.submit(_collect, items_b)
        va, vb = fa.result(), fb.result()
    sa, sb = set(va), set(vb)
    union_k = sorted(sa | sb)[:k]
    ku = set(union_k)
    n_inter = len(ku & sa & sb)
    # Empty union (both corpora empty): Jaccard is undefined — NULL, not
    # NaN, so the SQL twin's CASE WHEN nu = 0 THEN NULL guard stays
    # value-identical on the degenerate edge (ADVICE r8).
    j = n_inter / len(ku) if ku else None
    est_a = kmv_distinct_estimate(va, k)
    est_b = kmv_distinct_estimate(vb, k)
    est_union = kmv_distinct_estimate(union_k, k)
    row = (
        k,
        len(va),
        len(vb),
        est_a,
        est_b,
        est_union,
        j,
        j * est_union if j is not None else None,
    )
    return spark.createDataFrame(
        [row],
        "k_used int, n_sketch_a int, n_sketch_b int, est_distinct_a double,"
        " est_distinct_b double, est_union double, est_jaccard double,"
        " est_intersection double",
    )
