"""triangle_stats pins: hand-countable graphs, canonicalization, and the
exactly-once guarantee of the degree-ordered orientation."""

from hnsw_spark.operators.graph_stats import triangle_stats


def _stats(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return triangle_stats(df).collect()[0]


def test_k4_has_four_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _stats(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    # K4: every wedge closes -> ccoef 1.0 exactly
    assert r.n_wedges == 12 and r.ccoef_fp == 1_000_000


def test_triangle_plus_tail(spark):
    # one triangle {0,1,2} plus a pendant 2-3: wedges 3 + (deg(2)=3 -> 3)
    r = _stats(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    assert r.n_triangles == 1
    assert r.n_edges == 4 and r.n_nodes == 4
    assert r.n_wedges == 5  # nodes 0,1: 1 each; node 2: C(3,2)=3
    assert r.ccoef_fp == (3 * 1 * 1_000_000) // 5


def test_duplicates_reversals_and_self_loops_canonicalized(spark):
    messy = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (0, 2)]
    r = _stats(spark, messy)
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_free_graph(spark):
    # star K1,3: 3 wedges, no triangle -> ccoef 0
    r = _stats(spark, [(0, 1), (0, 2), (0, 3)])
    assert r.n_triangles == 0 and r.n_wedges == 3 and r.ccoef_fp == 0


def test_no_wedge_graph_null_coefficient(spark):
    r = _stats(spark, [(0, 1), (2, 3)])
    assert r.n_wedges == 0 and r.ccoef_fp is None


def _python_kcore(edges, k):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_k_core_matches_python_peeling(spark):
    import numpy as np

    from hnsw_spark.operators.graph_stats import k_core

    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 14
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.25
        ] or [(0, 1)]
        for k in (2, 3):
            want = _python_kcore(edges, k)
            df = spark.createDataFrame(edges, "id_a long, id_b long")
            got = {r.node: r.core_degree for r in k_core(df, k=k).collect()}
            assert got == want, (trial, k)


def test_k_core_of_clique_is_clique(spark):
    from hnsw_spark.operators.graph_stats import k_core

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    got = {r.node: r.core_degree for r in k_core(
        spark.createDataFrame(k5, "id_a long, id_b long"), k=4
    ).collect()}
    assert got == {i: 4 for i in range(5)}


def test_k_core_empty_when_k_exceeds_connectivity(spark):
    from hnsw_spark.operators.graph_stats import k_core

    chain = [(i, i + 1) for i in range(6)]
    assert k_core(
        spark.createDataFrame(chain, "id_a long, id_b long"), k=2
    ).count() == 0
