"""Partitioned HNSW graph tier tests — mirrors the reference's structural
invariants (tests/HNSW.test.ts) plus recall-vs-exact, its real oracle
(bench/README.md:108)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.hnsw_graph import (
    _LocalSim,
    _select_neighbors,
    build_hnsw_index,
    build_local_graph,
    final_entry,
    search_local_graph,
)
from hnsw_spark.operators.knn import knn_exact

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)


def test_final_entry_promotion_rules():
    # fresh build: the FIRST row to reach the global max (strictly-greater
    # promotion, src/main.ts:225-228)
    assert final_entry(np.array([0, 2, 1, 2, 0])) == 1
    # continued insert, new rows don't exceed the old max: entry persists
    assert final_entry(np.array([0, 2, 1, 0, 2]), n0=3, prev_entry=1) == 1
    # a new row exceeds the old max: promoted to the first such new row
    assert final_entry(np.array([0, 2, 1, 3, 3]), n0=3, prev_entry=1) == 3


def test_flat_beam_exhaustive_across_seeds():
    # levels pinned to 0 + ef >= n: the beam must visit the whole graph —
    # the connectivity property the ann_hnsw_full_probe oracle relies on
    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = 80
        vecs = rng.normal(size=(n, 6))
        levels = np.zeros(n, dtype=np.int64)
        nbrs = build_local_graph(
            levels, vecs, m=8, ef_construction=48, metric="cosine"
        )
        got = search_local_graph(
            levels, vecs, nbrs, rng.normal(size=6), k=n, ef=n, metric="cosine"
        )
        assert len(got) == n, f"seed {seed}: graph disconnected"


def test_diversity_heuristic_geometry():
    # reference tests/HNSW.test.ts:105-115: center (0,0); candidates at
    # (1,0), (2,0), (0,2); euclidean; expect [ (1,0), (0,2) ] — (2,0) is
    # shadowed by (1,0) being more similar to it than it is to the center.
    vecs = np.array([[0, 0], [1, 0], [2, 0], [0, 2]], dtype=np.float64)
    sim = _LocalSim(vecs, "euclidean")
    selected = _select_neighbors(sim, 0, [1, 2, 3], 2)
    assert selected == [1, 3]


def test_degree_bound_and_line_graph():
    # reference tests/HNSW.test.ts:81-103: 1-D line, M=2, all levels 0.
    vecs = np.array([[0, 0], [0, 1], [0, 2], [0, 3]], dtype=np.float64)
    levels = np.zeros(4, dtype=np.int64)
    nbrs = build_local_graph(levels, vecs, m=2, ef_construction=16, metric="euclidean")
    # last node keeps only its nearest (diversity shadows the rest)
    assert nbrs[3][0] == [2]
    assert len(nbrs[1][0]) <= 2
    assert set(nbrs[1][0]) == {0, 2}
    for row in nbrs:
        for lvl in row:
            assert len(lvl) <= 2


def test_local_search_exact_on_small_graph():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8))
    levels = np.zeros(50, dtype=np.int64)
    nbrs = build_local_graph(levels, vecs, m=8, ef_construction=50, metric="cosine")
    q = rng.normal(size=8)
    got = search_local_graph(levels, vecs, nbrs, q, k=5, ef=50, metric="cosine")
    qn = q / np.linalg.norm(q)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    exact = np.argsort(-(vn @ qn))[:5]
    assert [i for _, i in got] == list(exact)


def test_k_larger_than_graph_returns_all():
    vecs = np.array([[0, 1], [1, 0], [1, 1]], dtype=np.float64)
    levels = np.zeros(3, dtype=np.int64)
    nbrs = build_local_graph(levels, vecs, m=4, ef_construction=8, metric="cosine")
    got = search_local_graph(levels, vecs, nbrs, np.array([1.0, 1.0]), 10, 8)
    assert len(got) == 3  # reference tests/HNSW.test.ts:134-138


def test_empty_and_k_zero():
    assert search_local_graph(
        np.array([], dtype=np.int64), np.zeros((0, 2)), [], np.array([1.0, 0.0]), 5, 8
    ) == []
    vecs = np.array([[0, 1]], dtype=np.float64)
    nbrs = build_local_graph(np.zeros(1, dtype=np.int64), vecs, 4, 8, "cosine")
    assert search_local_graph(
        np.zeros(1, dtype=np.int64), vecs, nbrs, np.array([1.0, 0.0]), 0, 8
    ) == []


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_hnsw_index_recall_vs_exact(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") < 8)
    index = build_hnsw_index(
        embeddings, n_lists=4, m=16, ef_construction=100, metric="cosine"
    )
    approx = index.search(qs, k=10, n_probe=4, ef_search=100,
                          dispatch="beam").toPandas()
    exact = knn_exact(embeddings, qs, k=10, metric="cosine").toPandas()
    hits = 0
    for qid in exact["query_id"].unique():
        a = set(approx[approx["query_id"] == qid]["id"])
        e = set(exact[exact["query_id"] == qid]["id"])
        hits += len(a & e)
    recall = hits / len(exact)
    # n_probe = n_lists and wide ef → recall should be near-perfect
    assert recall >= 0.95, f"recall@10 = {recall}"
    # per-query contract: ≤ k rows, sorted score desc (src/main.ts:253-283)
    counts = approx.groupby("query_id").size()
    assert (counts <= 10).all()


def test_hnsw_persistence_roundtrip(spark, embeddings, tmp_path):
    # toJSON/fromJSON parity (src/main.ts:322-362 + tests/HNSW.test.ts:117-126):
    # a save→load round-trip returns identical search results, and the loaded
    # index comes back as an HNSWIndex with graph columns intact.
    from hnsw_spark.operators.hnsw_graph import HNSWIndex
    from hnsw_spark.plans.persistence import delete_index, load_index, save_index

    qs = embeddings.filter(F.col("vec_id") < 4)
    index = build_hnsw_index(embeddings, n_lists=2, m=8, ef_construction=32)
    path = str(tmp_path / "hnsw")
    before = {
        (r.query_id, r.id)
        for r in index.search(qs, k=5, n_probe=2, ef_search=32,
                              dispatch="beam").collect()
    }
    save_index(index, path)
    loaded = load_index(spark, path)
    assert isinstance(loaded, HNSWIndex)
    assert loaded.params["m"] == 8 and loaded.params["ef_construction"] == 32
    after = {
        (r.query_id, r.id)
        for r in loaded.search(qs, k=5, n_probe=2, ef_search=32,
                               dispatch="beam").collect()
    }
    assert before == after
    delete_index(path)
    assert load_index(spark, path) is None


def test_hnsw_index_narrow_probe_still_decent(spark, embeddings):
    qs = embeddings.filter(F.col("vec_id") < 8)
    index = build_hnsw_index(
        embeddings, n_lists=4, m=8, ef_construction=50, metric="euclidean"
    )
    approx = index.search(qs, k=10, n_probe=1, ef_search=50,
                          dispatch="beam").toPandas()
    exact = knn_exact(embeddings, qs, k=10, metric="euclidean").toPandas()
    hits = sum(
        len(
            set(approx[approx["query_id"] == qid]["id"])
            & set(exact[exact["query_id"] == qid]["id"])
        )
        for qid in exact["query_id"].unique()
    )
    assert hits / len(exact) >= 0.4  # 1/4 of lists probed


def test_ef_floors_to_k_and_empty_queries(spark, embeddings):
    # ef = max(k, efSearch) (src/main.ts:267): a tiny ef_search must still
    # return k rows per query; an empty query batch returns an empty frame.
    qs = embeddings.filter(F.col("vec_id") < 3)
    index = build_hnsw_index(embeddings, n_lists=2, m=8, ef_construction=32)
    got = index.search(qs, k=10, n_probe=2, ef_search=1,
                       dispatch="beam").toPandas()
    assert (got.groupby("query_id").size() == 10).all()
    empty = index.search(embeddings.filter(F.col("vec_id") < 0), k=5)
    assert empty.count() == 0


def test_recall_monotone_in_ef_search(spark):
    # the reference's documented expectation: efSearch up -> recall up
    # (bench/README.md:102-104); fixed seed + fixed index, widening beam.
    from hnsw_spark.operators.evaluation import mean_recall, recall_table
    from hnsw_spark.sources.synthetic import synthetic_vectors

    corpus = synthetic_vectors(spark, 3000, 16, seed=9).cache()
    qs = corpus.filter(F.col("vec_id") < 16)
    exact = knn_exact(corpus, qs, k=10, metric="cosine").cache()
    exact.count()
    idx = build_hnsw_index(corpus, n_lists=4, m=8, ef_construction=32)
    idx.index_df = idx.index_df.cache()
    idx.index_df.count()
    recalls = {}
    for ef in (10, 32, 100):
        approx = idx.search(qs, k=10, n_probe=4, ef_search=ef, dispatch="beam")
        recalls[ef] = mean_recall(recall_table(approx, exact)).first().mean_recall
    assert recalls[10] >= 0.8
    assert recalls[32] >= recalls[10]
    assert recalls[100] >= recalls[32]
    assert recalls[100] >= 0.99  # full probe + wide beam on a small corpus
    idx.index_df.unpersist()
    exact.unpersist()
    corpus.unpersist()


def test_incremental_add_points_matches_continued_build(spark):
    # addPoint parity (src/main.ts:234-248): inserting a second batch into a
    # live local graph gives the SAME adjacency as one continuous build over
    # the concatenation — build_local_graph(existing=...) is a continued
    # insertion sequence, not an approximation.
    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(60, 8))
    levels = (rng.random(60) * 2).astype(np.int64)
    full = build_local_graph(levels, vecs, m=6, ef_construction=24, metric="cosine")
    first = build_local_graph(
        levels[:40], vecs[:40], m=6, ef_construction=24, metric="cosine"
    )
    resumed = build_local_graph(
        levels, vecs, m=6, ef_construction=24, metric="cosine", existing=first
    )
    assert resumed == full


def test_add_points_index_searchable(spark, embeddings):
    # new vectors become findable; untouched-list rows keep their wiring
    from hnsw_spark.operators.hnsw_graph import add_points

    base = embeddings.filter(F.col("vec_id") < 300)
    extra = embeddings.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 340))
    index = build_hnsw_index(base, n_lists=2, m=8, ef_construction=32)
    index.index_df = index.index_df.cache()
    index.index_df.count()
    grown = add_points(index, extra)
    assert grown.index_df.count() == 340
    # query WITH one of the new vectors: it must rank itself first
    q = embeddings.filter(F.col("vec_id") == 320)
    got = grown.search(q, k=5, n_probe=2, ef_search=64,
                       dispatch="beam").toPandas()
    assert got.iloc[0]["id"] == 320
    # exact tier agreement on the grown corpus
    exact = knn_exact(embeddings.filter(F.col("vec_id") < 340), q, k=5).toPandas()
    inter = set(got["id"]) & set(exact["id"])
    assert len(inter) >= 4


def test_hnsw_full_probe_equals_exact(spark, embeddings):
    # the registered ann_hnsw_full_probe degeneration: levels pinned to 0,
    # all lists probed, ef >= list size -> identical id set to exact kNN
    qs = embeddings.filter(F.col("vec_id") < 8)
    index = build_hnsw_index(
        embeddings, n_lists=8, m=8, ef_construction=48, metric="cosine",
        max_level=0,
    )
    approx = {
        (r.query_id, r.id)
        for r in index.search(qs, k=10, n_probe=8, ef_search=1 << 20,
                              dispatch="beam").collect()
    }
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(embeddings, qs, k=10, metric="cosine").collect()
    }
    assert approx == exact
    # every node really is pinned to layer 0 and entry_id is constant per list
    nodes = index.index_df.select("list_id", "level", "entry_id").toPandas()
    assert (nodes["level"] == 0).all()
    assert (nodes.groupby("list_id")["entry_id"].nunique() == 1).all()


def test_entry_id_survives_add_points(spark, embeddings):
    # the persisted entry point obeys the promotion rule across incremental
    # inserts: unchanged unless a new row strictly exceeds the old max level
    from hnsw_spark.operators.hnsw_graph import add_points

    base = embeddings.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 600))
    extra = embeddings.filter(F.col("vec_id") < 40)  # ids BELOW every base id
    index = build_hnsw_index(base, n_lists=2, m=8, ef_construction=32)
    index.index_df = index.index_df.cache()
    before = (
        index.index_df.groupBy("list_id")
        .agg(F.first("entry_id").alias("e"), F.max("level").alias("mx"))
        .toPandas()
        .set_index("list_id")
    )
    grown = add_points(index, extra)
    after = grown.index_df.select("list_id", "id", "level", "entry_id").toPandas()
    for lid, grp in after.groupby("list_id"):
        assert grp["entry_id"].nunique() == 1
        e = int(grp["entry_id"].iloc[0])
        new_rows = grp[grp["id"] < 40]
        old_max = int(before.loc[lid, "mx"])
        if new_rows.empty or int(new_rows["level"].max()) <= old_max:
            assert e == int(before.loc[lid, "e"])  # no promotion
        else:
            # promoted: first (lowest-id) NEW row at the new global max
            gm = int(grp["level"].max())
            assert e == int(new_rows[new_rows["level"] == gm]["id"].min())
    index.index_df.unpersist()


def test_recall_improves_with_m(spark):
    # the reference's second documented curve: M up -> recall up (denser
    # graphs route better; bench/README.md:102-104), fixed seed and beam.
    from hnsw_spark.operators.evaluation import mean_recall, recall_table
    from hnsw_spark.sources.synthetic import synthetic_vectors

    corpus = synthetic_vectors(spark, 3000, 16, seed=9).cache()
    qs = corpus.filter(F.col("vec_id") < 16)
    exact = knn_exact(corpus, qs, k=10, metric="cosine").cache()
    exact.count()
    recalls = {}
    for m in (4, 16):
        idx = build_hnsw_index(corpus, n_lists=4, m=m, ef_construction=32)
        approx = idx.search(qs, k=10, n_probe=4, ef_search=24, dispatch="beam")
        recalls[m] = mean_recall(recall_table(approx, exact)).first().mean_recall
    # measured 0.69 vs 0.97/0.98 — generous margins against flake
    assert recalls[4] >= 0.5
    assert recalls[16] >= recalls[4] + 0.1
    exact.unpersist()
    corpus.unpersist()


def test_add_points_on_pre_entry_id_index(spark, embeddings):
    """An index persisted before the entry_id column existed must still
    accept incremental inserts (the column is backfilled, ADVICE r2)."""
    from hnsw_spark.operators.hnsw_graph import add_points

    base = embeddings.filter(F.col("vec_id") < 100)
    extra = embeddings.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    index = build_hnsw_index(base, n_lists=2, m=8, ef_construction=32)
    index.index_df = index.index_df.drop("entry_id")  # pre-entry_id layout
    grown = add_points(index, extra)
    assert grown.index_df.count() == 120
    q = embeddings.filter(F.col("vec_id") == 110)
    got = grown.search(q, k=3, n_probe=2, ef_search=64,
                       dispatch="beam").toPandas()
    assert got.iloc[0]["id"] == 110


def test_batched_beam_matches_sequential():
    """The batched layer-0 beam (one hop across all queries per iteration,
    VERDICT r7 #5) matches the sequential beam GIVEN IDENTICAL SCORES; the
    einsum-vs-gemv kernels differ by up to 1 ulp, so near-tied NON-duplicate
    candidates at the ef boundary may legitimately swap in/out of the
    retained set (ADVICE r8).  The assertion therefore: retained counts
    equal; shared ids score-equal to 1 ulp; any symmetric-difference id's
    score sits within 1 ulp of the ef-th (worst retained) sequential score —
    i.e. divergence is ONLY ever a boundary tie-swap, never a missed or
    extra genuinely-better candidate."""
    from hnsw_spark.operators.hnsw_graph import (
        _LocalSim,
        _search_layer,
        _search_layer_batched,
        build_local_graph,
    )

    rng = np.random.RandomState(11)
    for metric in ("cosine", "euclidean"):
        for trial in range(3):
            n, d, n_q = 400, 16, 7
            vecs = rng.randn(n, d)
            if trial == 1:  # duplicate rows: exact score ties
                vecs[50:60] = vecs[0]
            levels = np.zeros(n, dtype=int)
            nbrs = build_local_graph(levels, vecs, m=6, ef_construction=24,
                                     metric=metric)
            adj0 = np.full((n, max(len(r[0]) for r in nbrs)), -1,
                           dtype=np.int64)
            for i, row in enumerate(nbrs):
                adj0[i, : len(row[0])] = row[0]
            sim = _LocalSim(vecs, metric)
            qs = rng.randn(n_q, d)
            qmat = np.stack([sim.prep_query(q) for q in qs])
            qq = np.einsum("ij,ij->i", qmat, qmat)
            entries = rng.randint(0, n, size=n_q).astype(np.int64)
            for ef in (5, 24, 1 << 20):
                got = _search_layer_batched(sim, adj0, qmat, qq, entries, ef)
                for qi in range(n_q):
                    want = _search_layer(
                        sim, nbrs, qmat[qi], int(entries[qi]), 0, ef
                    )
                    # retained SETS must match exactly; output order can
                    # differ only among exact-duplicate vectors, whose
                    # scores already vary by 1 ulp between gemv CALLS in
                    # the sequential path itself (BLAS batch-dependent
                    # rounding), so tie order was never kernel-stable
                    got_ids = {p for _, p in got[qi]}
                    want_ids = {p for _, p in want}
                    assert len(got_ids) == len(want_ids), (metric, trial, ef, qi)
                    score_of = {p: s for s, p in want}
                    score_of.update({p: s for s, p in got[qi]})
                    boundary = min(s for s, _ in want)
                    for p in got_ids ^ want_ids:
                        assert score_of[p] == pytest.approx(
                            boundary, rel=1e-12, abs=1e-12
                        ), (metric, trial, ef, qi, p)
                    ws_by_id = {p: s for s, p in want}
                    for gs, p in got[qi]:
                        if p in ws_by_id:
                            assert gs == pytest.approx(ws_by_id[p], abs=1e-12)


def test_batched_beam_chunking_is_result_invariant(monkeypatch):
    """Shrinking _VISITED_BUDGET so every batch is chunked (ADVICE r8 memory
    cliff) must produce the exact same per-query results as one dense pass —
    queries are independent, so chunking can only change allocation, never
    output."""
    import hnsw_spark.operators.hnsw_graph as hg

    rng = np.random.RandomState(7)
    n, d, n_q = 300, 12, 9
    vecs = rng.randn(n, d)
    levels = np.zeros(n, dtype=int)
    nbrs = hg.build_local_graph(levels, vecs, m=6, ef_construction=24,
                                metric="cosine")
    adj0 = np.full((n, max(len(r[0]) for r in nbrs)), -1, dtype=np.int64)
    for i, row in enumerate(nbrs):
        adj0[i, : len(row[0])] = row[0]
    sim = hg._LocalSim(vecs, "cosine")
    qs = rng.randn(n_q, d)
    qmat = np.stack([sim.prep_query(q) for q in qs])
    qq = np.einsum("ij,ij->i", qmat, qmat)
    entries = rng.randint(0, n, size=n_q).astype(np.int64)
    dense = hg._search_layer_batched(sim, adj0, qmat, qq, entries, ef=16)
    monkeypatch.setattr(hg, "_VISITED_BUDGET", 2 * n)  # chunk = 2 queries
    chunked = hg._search_layer_batched(sim, adj0, qmat, qq, entries, ef=16)
    assert chunked == dense


def test_merge_hnsw_indexes_full_probe_equals_exact(spark, embeddings):
    """Segment merge (VERDICT r8 #4): delta nodes re-inserted under the base
    quantizer; full probe over the merged index == exact kNN over the union,
    metric mismatch raises, and node counts add up with no duplicates."""
    from hnsw_spark.operators.hnsw_graph import merge_hnsw_indexes

    half_a = embeddings.filter(F.col("vec_id") % 2 == 0)
    half_b = embeddings.filter(F.col("vec_id") % 2 == 1)
    a = build_hnsw_index(half_a, n_lists=4, m=8, ef_construction=48,
                         max_level=0)
    b = build_hnsw_index(half_b, n_lists=2, m=8, ef_construction=48,
                         max_level=0)
    merged = merge_hnsw_indexes(a, b)
    n_total = embeddings.count()
    assert merged.index_df.count() == n_total
    assert merged.index_df.select("id").distinct().count() == n_total
    assert np.array_equal(merged.centroids, a.centroids)  # base quantizer
    qs = embeddings.filter(F.col("vec_id") < 6)
    got = {
        (r.query_id, r.id)
        for r in merged.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(embeddings, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    c = build_hnsw_index(half_b, n_lists=2, m=8, metric="euclidean")
    with pytest.raises(ValueError, match="metric"):
        merge_hnsw_indexes(a, c)


def test_merge_hnsw_int8_segments_preserves_codes(spark, embeddings):
    """int8 segment merge (round 10, closing the r9 raises-by-design edge):
    the delta's codes + per-vector scales survive VERBATIM (no re-encoding
    loss), so full probe over the merged index == exact kNN over the
    dequantized union; mixing stores raises the clear contract error
    instead of an unresolved-column AnalysisException (ADVICE r9)."""
    from hnsw_spark.functions.quantize import quant_scale, quantize
    from hnsw_spark.operators.hnsw_graph import merge_hnsw_indexes

    half_a = embeddings.filter(F.col("vec_id") % 2 == 0)
    half_b = embeddings.filter(F.col("vec_id") % 2 == 1)
    a = build_hnsw_index(half_a, n_lists=4, m=8, ef_construction=48,
                         max_level=0, store="int8")
    b = build_hnsw_index(half_b, n_lists=2, m=8, ef_construction=48,
                         max_level=0, store="int8")
    # pin the delta's codes before and after: byte-identical passthrough
    before = {
        r["id"]: (tuple(r["qvec"]), r["scale"])
        for r in b.index_df.select("id", "qvec", "scale").collect()
    }
    merged = merge_hnsw_indexes(a, b)
    merged.index_df = merged.index_df.cache()
    n_total = embeddings.count()
    assert merged.index_df.count() == n_total
    after = {
        r["id"]: (tuple(r["qvec"]), r["scale"])
        for r in merged.index_df.select("id", "qvec", "scale").collect()
        if r["id"] in before
    }
    assert after == before
    qs = embeddings.filter(F.col("vec_id") < 6)
    got = {
        (r.query_id, r.id)
        for r in merged.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    deq = embeddings.select(
        "vec_id",
        F.transform(
            quantize("embedding", quant_scale("embedding")),
            lambda x: x.cast("double") * quant_scale("embedding"),
        ).alias("embedding"),
    )
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(deq, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    merged.index_df.unpersist()
    # store mismatch: clear error, both directions
    f = build_hnsw_index(half_b, n_lists=2, m=8, max_level=0)
    with pytest.raises(ValueError, match="store mismatch"):
        merge_hnsw_indexes(a, f)
    with pytest.raises(ValueError, match="store mismatch"):
        merge_hnsw_indexes(f, a)


def test_salted_build_balances_and_searches(spark, embeddings):
    """max_list_size (the skew guard, hash-mod since round 10): sub-list
    sizes statistically balanced (mean ≤ cap per list, max ≤ 2·cap — the
    binomial contract hash assignment trades for a window-free build plan,
    VERDICT r9 #5), sub counts exactly ⌈n/cap⌉, no node lost/duplicated,
    partial-probe search still works, full probe at level 0 equals exact,
    and the build plan carries NO window/sort stage (the r9 rank salt's
    single-task straggler)."""
    cap = 60
    idx = build_hnsw_index(
        embeddings, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=cap,
    )
    plan = idx.index_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    nodes = idx.index_df.cache()
    n_total = embeddings.count()
    assert nodes.count() == n_total
    assert nodes.select("id").distinct().count() == n_total
    sizes = nodes.groupBy("list_id", "sub_id").count().toPandas()
    assert (sizes["count"] <= 2 * cap).all()
    per_list = sizes.groupby("list_id")["count"].agg(["sum", "size"])
    import math
    for _, row in per_list.iterrows():
        assert row["size"] == math.ceil(row["sum"] / cap)
        assert row["sum"] <= row["size"] * cap  # mean sub size ≤ cap
    qs = embeddings.filter(F.col("vec_id") < 6)
    got = {
        (r.query_id, r.id)
        for r in idx.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(embeddings, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    # partial probe: a query finds itself (it lives in its own best list)
    one = embeddings.filter(F.col("vec_id") == 3)
    top = idx.search(one, k=3, n_probe=1, ef_search=64,
                     dispatch="beam").toPandas()
    assert top.iloc[0]["id"] == 3
    nodes.unpersist()


def test_salted_add_points_full_probe_exact(spark, embeddings):
    """Incremental insert into a SALTED index (round 10 — sound now that
    sub-list membership is a pure hash of id: existing nodes keep their
    sub_id, new nodes hash over the grown salt count): full probe over the
    grown index == exact kNN over the union, counts add up, and the cap
    discipline holds statistically."""
    from hnsw_spark.operators.hnsw_graph import add_points

    cap = 60
    base = embeddings.filter(F.col("vec_id") < 300)
    extra = embeddings.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    )
    idx = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=cap,
    )
    idx.index_df = idx.index_df.cache()
    idx.index_df.count()
    grown = add_points(idx, extra)
    grown.index_df = grown.index_df.cache()
    assert grown.index_df.count() == 400
    assert grown.index_df.select("id").distinct().count() == 400
    sizes = grown.index_df.groupBy("sub_id").count().toPandas()
    assert (sizes["count"] <= 2 * cap).all()
    union = embeddings.filter(F.col("vec_id") < 400)
    qs = embeddings.filter(F.col("vec_id").isin(2, 150, 310, 399))
    got = {
        (r.query_id, r.id)
        for r in grown.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(union, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    grown.index_df.unpersist()
    idx.index_df.unpersist()


def test_int8_store_roundtrip_and_guards(spark, embeddings, tmp_path):
    """int8 graph tier: 4x smaller node payload, persistence round-trip
    searches identically, unknown store raises."""
    from hnsw_spark.plans.persistence import load_index, save_index

    idx = build_hnsw_index(
        embeddings, n_lists=4, m=8, ef_construction=32, store="int8"
    )
    assert "qvec" in idx.index_df.columns and "vector" not in idx.index_df.columns
    qs = embeddings.filter(F.col("vec_id") < 4)
    before = {
        (r.query_id, r.id)
        for r in idx.search(qs, k=5, n_probe=4, ef_search=64,
                            dispatch="beam").collect()
    }
    path = str(tmp_path / "hnsw_i8")
    save_index(idx, path)
    loaded = load_index(spark, path)
    assert loaded.params["store"] == "int8"
    after = {
        (r.query_id, r.id)
        for r in loaded.search(qs, k=5, n_probe=4, ef_search=64,
                               dispatch="beam").collect()
    }
    assert before == after
    # quantization loses little on the fixture: self-match still rank-1
    one = embeddings.filter(F.col("vec_id") == 2)
    top = idx.search(one, k=3, n_probe=4, ef_search=64,
                     dispatch="beam").toPandas()
    assert top.iloc[0]["id"] == 2
    with pytest.raises(ValueError, match="store"):
        build_hnsw_index(embeddings, n_lists=2, store="pq")


def test_int8_add_points_full_probe_exact(spark, embeddings):
    """Incremental insert into an int8 index (round 10 — scales are
    per-vector, so new vectors just quantize with their own): full probe
    at level 0 == exact kNN over the DEQUANTIZED union, i.e. the insert's
    quantize → wire → search loop is value-faithful end-to-end."""
    from hnsw_spark.functions.quantize import quant_scale, quantize
    from hnsw_spark.operators.hnsw_graph import add_points

    base = embeddings.filter(F.col("vec_id") < 300)
    extra = embeddings.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 380)
    )
    idx = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, max_level=0, store="int8"
    )
    idx.index_df = idx.index_df.cache()
    idx.index_df.count()
    grown = add_points(idx, extra)
    grown.index_df = grown.index_df.cache()
    assert grown.index_df.count() == 380
    assert "qvec" in grown.index_df.columns
    union = embeddings.filter(F.col("vec_id") < 380)
    qs = embeddings.filter(F.col("vec_id").isin(1, 305, 379))
    got = {
        (r.query_id, r.id)
        for r in grown.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    deq = union.select(
        "vec_id",
        F.transform(
            quantize("embedding", quant_scale("embedding")),
            lambda x: x.cast("double") * quant_scale("embedding"),
        ).alias("embedding"),
    )
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(deq, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    grown.index_df.unpersist()
    idx.index_df.unpersist()


def test_int8_salted_compose(spark, embeddings):
    """store='int8' and max_list_size compose: salted sub-lists of
    quantized nodes, full probe == exact over the DEQUANTIZED corpus."""
    from hnsw_spark.functions.quantize import quant_scale, quantize

    idx = build_hnsw_index(
        embeddings, n_lists=4, m=8, ef_construction=32, max_level=0,
        store="int8", max_list_size=60,
    )
    cols = set(idx.index_df.columns)
    assert {"sub_id", "qvec", "scale"} <= cols and "vector" not in cols
    sizes = idx.index_df.groupBy("sub_id").count().toPandas()
    assert (sizes["count"] <= 2 * 60).all()  # hash-mod statistical cap
    qs = embeddings.filter(F.col("vec_id") < 4)
    got = {
        (r.query_id, r.id)
        for r in idx.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    deq = embeddings.select(
        "vec_id",
        F.transform(
            quantize("embedding", quant_scale("embedding")),
            lambda x: x.cast("double") * quant_scale("embedding"),
        ).alias("embedding"),
    )
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(deq, qs, k=10, metric="cosine").collect()
    }
    assert got == exact


def test_salted_matrix_merge_and_int8_insert(spark, embeddings):
    """The last two cells of the insert/merge × store/salt matrix
    (round 10): (a) merging an UNSALTED delta into a salted base re-routes
    AND re-salts the delta under the base's grown totals without shifting
    any existing node's sub-list; (b) inserting raw vectors into a
    salted × int8 base quantizes and salts in one pass.  Both grown
    indexes degenerate to exact kNN at full probe."""
    from hnsw_spark.functions.quantize import quant_scale, quantize
    from hnsw_spark.operators.hnsw_graph import add_points, merge_hnsw_indexes

    half_a = embeddings.filter(F.col("vec_id") % 2 == 0)
    half_b = embeddings.filter(F.col("vec_id") % 2 == 1)
    qs = embeddings.filter(F.col("vec_id") < 6)

    # (a) float: salted base <- unsalted delta through the merge path
    base = build_hnsw_index(
        half_a, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=60,
    )
    base.index_df = base.index_df.cache()
    before = {
        r["id"]: r["sub_id"]
        for r in base.index_df.select("id", "sub_id").collect()
    }
    delta = build_hnsw_index(half_b, n_lists=2, m=8, ef_construction=32,
                             max_level=0)
    merged = merge_hnsw_indexes(base, delta)
    merged.index_df = merged.index_df.cache()
    assert merged.index_df.count() == embeddings.count()
    # hash-mod membership is growth-stable: existing nodes keep sub_id
    after = {
        r["id"]: r["sub_id"]
        for r in merged.index_df.select("id", "sub_id").collect()
        if r["id"] in before
    }
    assert after == before
    got = {
        (r.query_id, r.id)
        for r in merged.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(embeddings, qs, k=10, metric="cosine").collect()
    }
    assert got == exact
    merged.index_df.unpersist()
    base.index_df.unpersist()

    # (b) salted x int8 base <- raw insert
    base2 = build_hnsw_index(
        half_a, n_lists=4, m=8, ef_construction=32, max_level=0,
        store="int8", max_list_size=60,
    )
    grown = add_points(base2, half_b)
    grown.index_df = grown.index_df.cache()
    assert grown.index_df.count() == embeddings.count()
    assert {"sub_id", "qvec", "scale"} <= set(grown.index_df.columns)
    got2 = {
        (r.query_id, r.id)
        for r in grown.search(
            qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
        ).collect()
    }
    deq = embeddings.select(
        "vec_id",
        F.transform(
            quantize("embedding", quant_scale("embedding")),
            lambda x: x.cast("double") * quant_scale("embedding"),
        ).alias("embedding"),
    )
    exact2 = {
        (r.query_id, r.id)
        for r in knn_exact(deq, qs, k=10, metric="cosine").collect()
    }
    assert got2 == exact2
    grown.index_df.unpersist()


def test_crossover_aware_dispatch(spark, embeddings, monkeypatch):
    """VERDICT r8 #3: small batches (Q x N under the measured exact-BLAS
    crossover budget) route to the exact local_merge operator automatically;
    above the budget the beam serves; "exact"/"beam" force a path; unknown
    modes raise.  The exact route's physical plan has NO cogroup stage (the
    beam's signature), so beam-path work can never regress small-Q serving."""
    import hnsw_spark.operators.hnsw_graph as hg

    qs = embeddings.filter(F.col("vec_id") < 8)
    idx = build_hnsw_index(embeddings, n_lists=4, m=8, ef_construction=32)
    idx.index_df = idx.index_df.cache()

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # fixture scale: Q*N = 8*2000 cells, far under the 64M budget -> exact
    auto = idx.search(qs, k=10, n_probe=1, ef_search=1)
    assert "CoGroup" not in plan_of(auto)
    exact = knn_exact(embeddings, qs, k=10, metric="cosine")
    assert {(r.query_id, r.id) for r in auto.collect()} == {
        (r.query_id, r.id) for r in exact.collect()
    }
    assert idx.params["n_vectors"] == embeddings.count()  # memoized
    # shrink the budget so the same batch lands above the crossover -> beam
    monkeypatch.setattr(hg, "_EXACT_DISPATCH_CELLS", 0)
    beam = idx.search(qs, k=10, n_probe=4, ef_search=64)
    assert "CoGroup" in plan_of(beam)
    # forced modes override the budget in both directions
    monkeypatch.setattr(hg, "_EXACT_DISPATCH_CELLS", 1 << 40)
    assert "CoGroup" in plan_of(
        idx.search(qs, k=10, n_probe=4, ef_search=64, dispatch="beam")
    )
    monkeypatch.setattr(hg, "_EXACT_DISPATCH_CELLS", 0)
    assert "CoGroup" not in plan_of(
        idx.search(qs, k=10, n_probe=4, dispatch="exact")
    )
    with pytest.raises(ValueError, match="dispatch"):
        idx.search(qs, k=10, dispatch="nope")
    idx.index_df.unpersist()


def test_search_beam_modes_agree_end_to_end(spark, embeddings):
    """index.search under both beam modes returns the same (query, id)
    result set on the fixture (scores may differ by 1 ulp)."""
    idx = build_hnsw_index(
        embeddings, n_lists=4, m=8, ef_construction=32, metric="cosine"
    )
    qs = embeddings.filter(F.col("vec_id") < 6)
    a = idx.search(qs, k=10, n_probe=4, ef_search=64, beam="batched",
                   dispatch="beam")
    b = idx.search(qs, k=10, n_probe=4, ef_search=64, beam="sequential",
                   dispatch="beam")
    sa = {(r.query_id, r.id) for r in a.collect()}
    sb = {(r.query_id, r.id) for r in b.collect()}
    assert sa == sb


def test_greedy_upper_matches_full_nbrs_descent():
    """The sparse upper-layer dict descent (_greedy_upper) must land on the
    same per-level local maximum as _greedy_search over the full nested
    adjacency — for every query and entry, across metrics."""
    from hnsw_spark.operators.hnsw_graph import (
        _LocalSim,
        _greedy_search,
        _greedy_upper,
        build_local_graph,
    )

    rng = np.random.RandomState(23)
    n, d = 300, 12
    vecs = rng.randn(n, d)
    levels = np.minimum(rng.geometric(0.6, n) - 1, 3)
    for metric in ("cosine", "euclidean"):
        nbrs = build_local_graph(levels, vecs, m=6, ef_construction=24,
                                 metric=metric)
        upper = {
            i: nbrs[i] for i in range(n) if levels[i] > 0
        }
        sim = _LocalSim(vecs, metric)
        level_max = int(levels.max())
        entry = int(np.argmax(levels == level_max))
        for q in rng.randn(5, d):
            qprep = sim.prep_query(q)
            ep_full, ep_sparse = entry, entry
            for level in range(level_max, 0, -1):
                ep_full = _greedy_search(sim, nbrs, qprep, ep_full, level)
                ep_sparse = _greedy_upper(sim, upper, qprep, ep_sparse, level)
                assert ep_full == ep_sparse, (metric, level)


def test_add_points_untouched_lists_skip_rewire(spark, embeddings):
    """Partial-touch insert: lists that receive no new nodes must come
    through row-identical (wiring, entry point, order-insensitive), now
    that they bypass the rewire cogroup entirely — and the grown index
    must still answer full probes exactly."""
    from hnsw_spark.operators.hnsw_graph import add_points

    base = embeddings.filter(F.col("vec_id") < 300)
    index = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, metric="cosine",
        max_level=0, seed=7,
    )
    index.index_df = index.index_df.cache()
    before = {r["id"]: r for r in index.index_df.collect()}
    # route the delta to exactly the lists of two EXISTING vectors by
    # reusing (slightly perturbed) copies of them: same argmax centroid
    seeds = {r.vec_id: r.embedding for r in base.filter(
        F.col("vec_id").isin(0, 1)).collect()}
    delta = spark.createDataFrame(
        [(1000 + i, [x * 1.01 for x in seeds[i]]) for i in (0, 1)],
        "vec_id long, embedding array<float>",
    )
    grown = add_points(index, delta)
    rows = grown.index_df.collect()
    assert len(rows) == 302
    touched_lists = {
        r["list_id"] for r in rows if r["id"] in (1000, 1001)
    }
    for r in rows:
        if r["list_id"] not in touched_lists and r["id"] < 300:
            b = before[r["id"]]
            assert r["neighbors"] == b["neighbors"]
            assert r["entry_id"] == b["entry_id"]
            assert r["level"] == b["level"]
    # full probe on the grown index degenerates to exact kNN
    qs = embeddings.filter(F.col("vec_id") < 4)
    approx = {
        (r.query_id, r.id)
        for r in grown.search(qs, k=10, n_probe=4, ef_search=1 << 20,
                              dispatch="beam").collect()
    }
    allv = base.select("vec_id", "embedding").unionByName(delta)
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(allv, qs, k=10, metric="cosine").collect()
    }
    assert approx == exact


def test_salted_sub_map_params_fast_path_parity(spark, embeddings, tmp_path):
    """The publish-time fan-out map (params['sub_ids'], save_index) must
    route searches identically to the distinct-derived fallback: same map
    values as distinct over the node table, same full-probe results with
    and without the metadata, and add_points must extend the map to cover
    every sub-list of the grown index."""
    from hnsw_spark.operators.hnsw_graph import add_points
    from hnsw_spark.plans.persistence import load_index, save_index

    base = embeddings.filter(F.col("vec_id") < 300)
    built = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=40, seed=7,
    )
    assert "sub_ids" not in built.params  # build stays lazy: no metadata
    path = str(tmp_path / "salted_idx")
    save_index(built, path)
    loaded = load_index(spark, path)
    actual = sorted(
        r["sub_id"]
        for r in loaded.index_df.select("sub_id").distinct().collect()
    )
    assert loaded.params["sub_ids"] == actual
    qs = embeddings.filter(F.col("vec_id") < 6)

    def pairs(idx):
        return {
            (r.query_id, r.id)
            for r in idx.search(
                qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
            ).collect()
        }
    fast = pairs(loaded)
    stripped = load_index(spark, path)
    stripped.params.pop("sub_ids")
    assert fast == pairs(stripped)  # fallback parity
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(base, qs, k=10, metric="cosine").collect()
    }
    assert fast == exact
    # grown index: map extends with the insert's touched set and still
    # covers every physical sub-list
    delta = embeddings.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    )
    grown = add_points(load_index(spark, path), delta)
    grown_actual = {
        r["sub_id"]
        for r in grown.index_df.select("sub_id").distinct().collect()
    }
    assert grown_actual <= set(grown.params["sub_ids"])
    allv = embeddings.filter(F.col("vec_id") < 400)
    exact_grown = {
        (r.query_id, r.id)
        for r in knn_exact(allv, qs, k=10, metric="cosine").collect()
    }
    assert pairs(grown) == exact_grown


def test_salted_fresh_build_counts_map_parity(spark, embeddings):
    """VERDICT r13 #7: a FRESH never-saved salted index derives its search
    fan-out map from the build's own per-list salt counts
    (HNSWIndex._salt_counts), not the distinct-over-node-table fallback —
    the counts-derived map must be a superset of the physical sub_ids and
    the full-probe search must equal exact kNN and the fallback's result,
    both for the fresh build and for an insert into a never-saved base
    (where untouched lists must stay covered by the map)."""
    from hnsw_spark.operators.hnsw_graph import _SALT_STRIDE, add_points

    base = embeddings.filter(F.col("vec_id") < 300)
    built = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=40, seed=7,
    )
    assert "sub_ids" not in built.params and built._salt_counts is not None
    derived = {
        int(r["list_id"]) * _SALT_STRIDE + j
        for r in built._salt_counts.collect()
        for j in range(int(r["_n_salts"]))
    }
    actual = {
        r["sub_id"]
        for r in built.index_df.select("sub_id").distinct().collect()
    }
    assert actual <= derived
    qs = embeddings.filter(F.col("vec_id") < 6)

    def pairs(idx):
        return {
            (r.query_id, r.id)
            for r in idx.search(
                qs, k=10, n_probe=4, ef_search=1 << 20, dispatch="beam"
            ).collect()
        }

    exact = {
        (r.query_id, r.id)
        for r in knn_exact(base, qs, k=10, metric="cosine").collect()
    }
    assert pairs(built) == exact
    # force the old distinct fallback and compare
    fb = build_hnsw_index(
        base, n_lists=4, m=8, ef_construction=32, max_level=0,
        max_list_size=40, seed=7,
    )
    fb._salt_counts = None
    assert pairs(fb) == exact
    # grown from a never-saved base: only SOME lists receive delta nodes,
    # so the map must still cover old-only lists
    delta = embeddings.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 330)
    )
    grown = add_points(built, delta)
    assert "sub_ids" not in grown.params and grown._salt_counts is not None
    grown_derived = {
        int(r["list_id"]) * _SALT_STRIDE + j
        for r in grown._salt_counts.collect()
        for j in range(int(r["_n_salts"]))
    }
    grown_actual = {
        r["sub_id"]
        for r in grown.index_df.select("sub_id").distinct().collect()
    }
    assert grown_actual <= grown_derived
    allv = embeddings.filter(
        (F.col("vec_id") < 300)
        | ((F.col("vec_id") >= 300) & (F.col("vec_id") < 330))
    )
    exact_grown = {
        (r.query_id, r.id)
        for r in knn_exact(allv, qs, k=10, metric="cosine").collect()
    }
    assert pairs(grown) == exact_grown
