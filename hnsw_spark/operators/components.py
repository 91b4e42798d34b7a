"""Connected components over a near-dup pair graph — the closure step of the
dedup ladder.

Every pair tier (exact fingerprint, n-gram Jaccard, MinHash-LSH, SimHash,
embedding cosine — operators/dedup.py, operators/ann.py) emits PAIRS, but a
training-data pipeline deletes by CLUSTER: duplicates are transitive in
practice (A≈B, B≈C ⇒ drop two of {A,B,C}), so the pair graph must be closed
into components and one canonical survivor kept per component.  The reference
stops at pairwise similarity (its recall join, src/bench/metrics.ts:26-44, is
the closest analogue); this operator is part of the beyond-reference pipeline
surface.

Algorithm: distributed min-label propagation with pointer-jumping
(label := label(label) each round), the classic Hash-to-Min style shape
[Rastogi et al., "Finding Connected Components in Map-Reduce", ICDE 2013].
Each iteration is two shuffles over the EDGE-ENDPOINT set only — nodes that
never appear in a pair (the overwhelming majority of a deduplicated corpus)
are attached in one final left-anti pass and never enter the loop.  With
pointer jumping the iteration count is O(log d) in the component diameter;
near-dup clusters are small and dense, so 3-4 rounds converge in practice.
Per-round ``localCheckpoint`` truncates the logical plan, which otherwise
doubles in size every iteration and stalls Catalyst analysis long before the
data is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Resolve the undirected graph given as an edge list into components.

    Returns DataFrame[(id LONG, cluster_id LONG)] covering every id that
    appears in at least one edge; ``cluster_id`` is the MINIMUM id reachable
    from ``id``, so labels are deterministic regardless of partitioning or
    join order.  Raises after ``max_iter`` rounds without convergence (a
    pathological diameter — for near-dup graphs this means the threshold is
    too loose, not that more iterations would help).

    ``shuffle_partitions`` temporarily overrides the session shuffle width
    for the loop's (eagerly executed) iterations: the iterated state is the
    pair-endpoint set, typically orders of magnitude smaller than the corpus
    that produced it, and per-iteration fixed cost is proportional to task
    count.  Size it to the edge count (None = leave the session setting —
    the right call when the pair graph itself is huge).

    Convergence is detected by Σ label, which strictly decreases until the
    fixpoint — one narrow aggregate per round instead of a join against the
    previous labels.
    """
    # both orientations, deduped: multi-tier edge lists overlap and every
    # duplicate edge would be re-joined each round
    a = F.col(id_a).cast("long")
    b = F.col(id_b).cast("long")
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        sym = (
            edges.select(a.alias("src"), b.alias("dst"))
            .union(edges.select(b.alias("src"), a.alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint(eager=True)
        )
        prev_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        for _ in range(max_iter):
            # neighbor-min: the best label visible one hop away
            nbr = (
                sym.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("nbr"))
            )
            stepped = labels.join(nbr, "id", "left").select(
                "id", F.least("label", F.coalesce("nbr", "label")).alias("label")
            )
            # pointer jump: follow the label chain one hop (label(label) ≤
            # label), turning linear chain propagation into logarithmic
            jumped = (
                stepped.alias("x")
                .join(
                    stepped.select(
                        F.col("id").alias("jid"), F.col("label").alias("jlabel")
                    ),
                    F.col("x.label") == F.col("jid"),
                    "left",
                )
                .select(
                    F.col("x.id").alias("id"),
                    F.least(
                        F.col("x.label"), F.coalesce("jlabel", F.col("x.label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            new_sum = jumped.agg(
                F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            converged = new_sum == prev_sum
            labels, prev_sum = jumped, new_sum
            if converged:
                return labels.select("id", F.col("label").alias("cluster_id"))
    finally:
        spark.conf.set(conf_key, saved)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations — "
        "component diameter is pathological for a near-dup graph"
    )


def dedup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Assign every document a duplicate-cluster id and mark the canonical
    survivor (minimum id in its component, the ``exact_dedup`` convention).

    Returns DataFrame[(id_col, cluster_id LONG, is_canonical INT)].  Documents
    absent from the pair graph are their own singleton cluster and never
    enter the iterative loop — at 100 TB the loop runs over pair endpoints
    (≪ corpus), and this final attachment is one broadcast-or-shuffle left
    join.  Downstream: ``filter(is_canonical = 1)`` IS the dedup;
    ``groupBy(cluster_id)`` sizes measure duplication rate.
    """
    comp = connected_components(
        edges,
        id_a=id_a,
        id_b=id_b,
        max_iter=max_iter,
        shuffle_partitions=shuffle_partitions,
    )
    did = F.col(id_col).cast("long")
    out = docs.select(did.alias(id_col)).join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    )
    cluster = F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    return out.select(
        id_col,
        cluster,
        (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col))
        .cast("int")
        .alias("is_canonical"),
    )


def canonical_by_score(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "prob",
) -> DataFrame:
    """Quality-aware survivor selection: within each duplicate cluster keep
    the HIGHEST-scoring document (ties by ascending id) instead of the
    min-id convention ``dedup_clusters`` defaults to.  This is how real
    curation pipelines resolve near-dup groups — the best copy survives,
    not an arbitrary one.

    ``clusters`` is (id_col, cluster_col) (the ``dedup_clusters`` output);
    ``scores`` is (id_col, score_col) (e.g. ``quality_classifier`` prob).
    Output: (id_col, cluster_col, quality, keep INT).

    One equi-join on id (both sides already doc-partitioned) and one window
    shuffled on cluster_id; cluster cardinality is bounded by near-dup group
    size, so the window never sees skew beyond the dedup graph itself.
    """
    j = clusters.select(id_col, cluster_col).join(
        scores.select(id_col, F.col(score_col).alias("_s")), id_col
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc("_s"), F.asc(id_col)
    )
    return j.select(
        id_col,
        cluster_col,
        # raw score (oracle-facing callers quantize)
        F.col("_s").alias("quality"),
        (F.row_number().over(w) == 1).cast("int").alias("keep"),
    )
