"""Connected-components closure of the dedup ladder (operators/components.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.components import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def test_components_chain_and_island(spark):
    # chain 1-2-3 (transitive), island 7-8, edge given in both orders
    e = _edges(spark, [(1, 2), (3, 2), (8, 7)])
    got = {
        (r.id, r.cluster_id) for r in connected_components(e).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_components_min_label_is_global_min_of_component(spark):
    # component {5, 9, 12, 40} wired as a star around 12: label must be the
    # component-global min (5), not the hub
    e = _edges(spark, [(12, 9), (12, 40), (12, 5)])
    got = {r.id: r.cluster_id for r in connected_components(e).collect()}
    assert got == {5: 5, 9: 5, 12: 5, 40: 5}


def test_components_long_path_converges_logarithmically(spark):
    # a 33-node path is the worst case for plain min propagation (32 hops);
    # pointer jumping must close it well inside max_iter=8
    n = 33
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    got = {r.id: r.cluster_id for r in connected_components(e, max_iter=8).collect()}
    assert got == {i: 0 for i in range(n)}


def test_components_raises_when_not_converged(spark):
    e = _edges(spark, [(i, i + 1) for i in range(20)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=1)


def test_components_self_loops_and_duplicate_edges_ignored(spark):
    e = _edges(spark, [(1, 1), (2, 3), (3, 2), (2, 3)])
    got = {(r.id, r.cluster_id) for r in connected_components(e).collect()}
    # the self-loop node never reaches the edge set; 2-3 resolves once
    assert got == {(2, 2), (3, 2)}


def test_dedup_clusters_attaches_singletons_and_marks_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id bigint, text string"
    )
    e = _edges(spark, [(0, 3), (3, 5)])
    rows = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup_clusters(docs, e).collect()
    }
    assert rows == {
        0: (0, 1),
        1: (1, 1),
        2: (2, 1),
        3: (0, 0),
        4: (4, 1),
        5: (0, 0),
    }
    # filter(is_canonical) is the dedup: exactly one survivor per cluster
    surv = [d for d, (_, canon) in rows.items() if canon]
    assert sorted(surv) == [0, 1, 2, 4]
