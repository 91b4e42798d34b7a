"""Distributed quantized Lloyd's k-means as pure DataFrame algebra.

Unlike the driver-side kmeans++ trainer behind the IVF coarse quantizer
(operators/ann.py — which samples to the driver or delegates to MLlib),
this operator keeps EVERY step on the cluster: assignment is a broadcast
join of k centroids against the corpus, the centroid update is one
(cluster, dim) aggregation, and one iteration is therefore one shuffle of
k·d partial sums — the textbook scale shape for k-means over 100 TB of
embeddings (the corpus is scanned once per iteration; nothing the size of
the data ever moves).

Determinism contract (what makes the gate oracle-exact instead of
"close"): vectors and centroids live in 1e-6 fixed-point BIGINT space —
x_fp = floor(x·10⁶ + 0.5) — so squared distances Σ(x_fp − c_fp)² are pure
integer arithmetic (order-free, engine-invariant), argmin ties break to
the smaller cluster id, and the centroid update is floor(Σx_fp / n): the
whole trajectory is a deterministic function of the input, reproducible
bit-for-bit by any engine including the DuckDB oracle.  Quantizing at
1e-6 perturbs each coordinate by ≤ 5·10⁻⁷ — far below any meaningful
cluster geometry; real k-means is tolerance-converged anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000.0


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, x: array<bigint>) with every coordinate dquant'ed to 1e-6."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda e: F.floor(e.cast("double") * _SCALE + 0.5).cast("bigint"),
        ).alias("x"),
    )


def _d2(x, c):
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def lloyd_assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """One assignment step: (id, cluster, d2) — nearest centroid by exact
    integer squared distance, ties to the smaller cluster id.

    ``centroids`` is DataFrame[(cluster, c: array<bigint>)], broadcast (k
    rows).  The argmin is computed with ``min_by`` over a struct ordinal —
    no rank window, O(1) state per id."""
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        "id",
        "cluster",
        _d2(F.col("x"), F.col("c")).alias("d2"),
    )
    # one aggregate: the struct is totally ordered (d2 first, cluster as the
    # tie-break), so min(pick) carries both the argmin cluster and its d2
    pick = F.struct(F.col("d2"), F.col("cluster"))
    return scored.groupBy("id").agg(F.min(pick).alias("_m")).select(
        "id", F.col("_m.cluster").alias("cluster"), F.col("_m.d2").alias("d2")
    )


def lloyd_update(vecs: DataFrame, assign: DataFrame) -> DataFrame:
    """One update step: per-cluster floor-mean centroid in fixed point.
    Shuffle carries k·d partial sums (posexplode then (cluster, pos)
    aggregate), never vectors.  Clusters that lost every point simply
    vanish (standard drop-empty-cluster rule — deterministic).

    The per-(cluster, pos) sum accumulates in decimal(38,0) — a BIGINT sum
    wraps silently past 2^63 in non-ANSI mode (DuckDB widens to HUGEINT,
    so engines would diverge exactly when it matters), and at 1e-6
    fixed-point a 100 TB corpus sits near that boundary (~1e7-magnitude
    coordinates × ~1e11 rows).  The floor-mean is then pure integer
    algebra, (s − pmod(s, n)) / n: the numerator is an exact multiple of
    n, so the decimal division is exact and no double rounding (exactness
    lost past 2^53) can touch the trajectory — keeping the module's
    bit-for-bit determinism contract honest (ADVICE r6)."""
    pos = vecs.join(assign.select("id", "cluster"), "id").select(
        "cluster", F.posexplode("x").alias("pos", "v")
    )
    s = F.col("_s")
    n = F.col("_n")
    cent = (
        pos.groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "cluster",
            "pos",
            ((s - F.pmod(s, n)) / n).cast("bigint").alias("cv"),
        )
    )
    return (
        cent.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "cv"))
                ),
                lambda s: s["cv"],
            ).alias("c")
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantized distributed Lloyd's: seed centroids = the vectors with the
    ``k`` smallest ids, then ``iterations`` assignment rounds with a
    centroid update between consecutive rounds, returning the last
    assignment (id, cluster, d2)."""
    from hnsw_spark.plans.cachereg import owned_persist

    # every round's assignment AND each centroid update scans the
    # quantized corpus (2·iterations consumers of the same subtree, plus
    # the seed TakeOrdered) — persist it so the quantize projection runs
    # once, not once per consumer.  Library-owned (release_caches() frees
    # it after the caller's action).
    vecs = owned_persist(quantize_vectors(df, vec_col, id_col))
    # the k smallest ids, not ``id < k``: ids need not be 0-based or dense
    # (a filter would silently under-seed or empty the centroid set).
    # orderBy+limit compiles to TakeOrderedAndProject — a k-row per-partition
    # heap merged on the driver, never a global sort.
    cents = vecs.orderBy("id").limit(k).select(
        F.col("id").alias("cluster"), F.col("x").alias("c")
    )
    assign = lloyd_assign(vecs, cents)
    for _ in range(iterations - 1):
        cents = lloyd_update(vecs, assign)
        assign = lloyd_assign(vecs, cents)
    return assign
