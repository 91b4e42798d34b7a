"""Synchronous label propagation (community detection) over an undirected
edge table — Raghavan et al. 2007, the deterministic synchronous variant.

Per round, every node adopts the most frequent label among its neighbors
(ties → the smallest label; isolated nodes keep their label).  Synchronous
update with a total tie-break order makes the trajectory a pure function
of the edge set — no RNG, no visit order — which is what lets the gate
query pin every node's community against an unrolled SQL oracle.

Scale shape per round: one join of the (2m)-row directed edge list against
the n-row label table, one (node, label) count aggregate, one per-node
argmax — all hash-partitioned on node id; nothing driver-side.  Rounds are
a constant (small) parameter; for long chains add localCheckpoint every
few rounds exactly as ``operators/components.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    rounds: int = 3,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    node_col: str = "node",
) -> DataFrame:
    """(node, community) after ``rounds`` synchronous LPA updates.

    ``edges`` holds each undirected edge once (any orientation);
    ``nodes`` is the full vertex set (isolated vertices included)."""
    from hnsw_spark.plans.cachereg import owned_persist

    # the edge list is consumed once per round and the caller's edge
    # pipeline may be expensive (the gate feeds a brute cosine self-join);
    # library-owned persist so rounds re-read, not re-derive
    ee = owned_persist(
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        ).union(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    )
    for _ in range(rounds):
        counts = (
            ee.join(
                labels.withColumnRenamed("node", "v"), "v"
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("n").desc(), F.col("label")
        )
        picked = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        # cache each round's labels: round r's frame is consumed TWICE by
        # round r+1 (the neighbor-count join and the carry-forward join),
        # so without it the plan tree doubles per round and the upstream
        # edge/label pipelines re-execute 2^rounds times.  owned_persist
        # (not localCheckpoint): the cache bounds re-EXECUTION while
        # staying lazy — no per-round blocking write — and rounds here are
        # a small constant so the logical-plan growth itself is bounded;
        # for long chains add localCheckpoint every few rounds exactly as
        # operators/components.py does.
        labels = owned_persist(
            labels.join(picked, "node", "left").select(
                "node", F.coalesce("_new", "label").alias("label")
            )
        )
    return labels.select("node", F.col("label").alias("community"))
