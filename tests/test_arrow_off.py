"""Arrow-OFF regression lane.

The engine's own session enables Arrow (session.py), but library consumers —
including the correctness driver — run plain `SparkSession.builder` sessions
where `spark.sql.execution.arrow.pyspark.enabled` defaults off.  In that
configuration `createDataFrame`'s `_createFromLocal` verifier type-checks
Python objects strictly and rejects numpy scalars inside arrays — exactly
the failure that broke `ann_binary_full_probe` / `ann_binary_recall` in
round 6 (numpy.int32 elements in `probe_lists`, operators/ann.py).

This lane replays every driver-side createDataFrame producer (route_probes
and the pq / binary / int8 store searches that route through it) with Arrow
disabled on the shared session, and pins result parity against the exact
operator so the flag cannot change answers either.  Reference-parity
rationale: the reference's CI runs its suite in the consumer's default
environment (/root/reference/.github/workflows/ci.yml:35-38), not a
specially-configured one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.ann import build_ivf_index, route_probes
from hnsw_spark.operators.knn import knn_exact
from hnsw_spark.sources.synthetic import synthetic_vectors

_ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"


@pytest.fixture()
def arrow_off(spark):
    prev = spark.conf.get(_ARROW_KEY)
    spark.conf.set(_ARROW_KEY, "false")
    try:
        yield spark
    finally:
        spark.conf.set(_ARROW_KEY, prev)


@pytest.fixture(scope="module")
def corpus(spark):
    df = synthetic_vectors(spark, 1200, 16, seed=11).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 8)


@pytest.fixture(scope="module")
def exact_top5(corpus, queries):
    res = knn_exact(corpus, queries, k=5, metric="cosine")
    return {(r.query_id, r.id) for r in res.collect()}


def test_route_probes_small_batch_arrow_off(arrow_off, corpus, queries):
    # the small-batch path ships a driver-routed pandas frame through
    # createDataFrame — with Arrow off this is the strict-verifier path
    index = build_ivf_index(corpus, n_lists=8, metric="cosine")
    probes = route_probes(queries, index.centroids, "cosine", n_probe=3)
    rows = probes.collect()
    assert len(rows) == 8 * 3
    # elements must be plain Python ints/floats end-to-end
    assert {type(r.list_id) for r in rows} == {int}
    assert all(0 <= r.list_id < 8 for r in rows)


@pytest.mark.parametrize("store", ["binary", "pq", "int8"])
def test_store_tiers_full_probe_arrow_off(
    arrow_off, corpus, queries, exact_top5, store
):
    # full probe + oversized exact re-rank degenerates every lossy store to
    # exact kNN; with Arrow off this exercises the whole route_probes →
    # join → rerank chain under the strict verifier (r6 driver crash path)
    kwargs = {"pq_m": 4} if store == "pq" else {}
    index = build_ivf_index(
        corpus, n_lists=8, metric="cosine", store=store, **kwargs
    )
    full = corpus.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    res = index.search(
        queries, k=5, n_probe=8, rerank_with=full, rerank_factor=100_000
    )
    got = {(r.query_id, r.id) for r in res.collect()}
    assert got == exact_top5


def test_float32_search_arrow_off_matches_arrow_on(spark, corpus, queries):
    # same knobs both ways: the Arrow flag is a transport setting and must
    # not change a single (query_id, id) pair
    index = build_ivf_index(corpus, n_lists=8, metric="cosine")
    on = {(r.query_id, r.id) for r in index.search(queries, k=5, n_probe=8).collect()}
    prev = spark.conf.get(_ARROW_KEY)
    spark.conf.set(_ARROW_KEY, "false")
    try:
        off = {
            (r.query_id, r.id)
            for r in index.search(queries, k=5, n_probe=8).collect()
        }
    finally:
        spark.conf.set(_ARROW_KEY, prev)
    assert on == off
