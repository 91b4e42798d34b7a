"""Crossover-aware exact-Jaccard plan dispatch (VERDICT r9 #4): the chooser
must route even corpora to the brute shingle equi-join and template-
concentrated corpora to the prefix-filtered PPJoin plan, from the measured
pair-row signal — and dispatch must never change values."""

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.dedup import (
    choose_jaccard_plan,
    jaccard_prefix_pairs,
    ngram_jaccard_auto,
    ngram_jaccard_pairs,
)
from hnsw_spark.sources.synthetic import (
    boilerplate_documents,
    synthetic_documents,
)


@pytest.fixture(scope="module")
def even_docs(spark):
    df = synthetic_documents(spark, 400, words_per_doc=30, seed=11).cache()
    yield df
    df.unpersist(blocking=True)


@pytest.fixture(scope="module")
def boil_docs(spark):
    df = boilerplate_documents(spark, 400, n_templates=2, seed=7).cache()
    yield df
    df.unpersist(blocking=True)


def test_even_corpus_routes_brute(even_docs):
    plan, ev = choose_jaccard_plan(even_docs, n=3, threshold=0.8)
    assert plan == "brute"
    # hash-word trigram dfs are near-singleton: pair rows ≪ factor·rows
    assert ev["est_pair_rows"] <= ev["factor"] * ev["shingle_rows"]


def test_templated_corpus_routes_prefix(boil_docs):
    plan, ev = choose_jaccard_plan(boil_docs, n=3, threshold=0.8)
    assert plan == "prefix"
    # 2 templates over 400 docs: each template shingle's df ≈ 200, so the
    # brute join would shuffle ~10 · C(200,2) · 2 pair rows — two orders
    # of magnitude past the dispatch budget
    assert ev["est_pair_rows"] > ev["factor"] * ev["shingle_rows"]


def test_low_threshold_always_brute(boil_docs):
    # below t=0.1 the prefix is ~the whole set: prefix can't prune, so the
    # chooser must not route there even on the boilerplate shape
    plan, ev = choose_jaccard_plan(boil_docs, n=3, threshold=0.05)
    assert plan == "brute"
    assert "threshold" in ev["reason"]


def _pairs_set(df):
    return {
        (r["id_a"], r["id_b"], r["n_common"], r["size_a"], r["size_b"])
        for r in df.collect()
    }


def test_dispatch_never_changes_values(boil_docs):
    auto = ngram_jaccard_auto(boil_docs, n=3, threshold=0.8)
    brute = ngram_jaccard_pairs(boil_docs, n=3, threshold=0.8)
    prefix = jaccard_prefix_pairs(boil_docs, n=3, threshold=0.8)
    got = _pairs_set(auto)
    assert got == _pairs_set(brute) == _pairs_set(prefix)
    # the planted 1-in-97 near-dups are exactly the expected pairs
    expected = {
        (d - 1, d) for d in range(1, 400) if d % 97 == 0
    }
    assert {(a, b) for a, b, *_ in got} == expected


def test_forced_plans_and_unknown_plan(even_docs):
    forced = ngram_jaccard_auto(even_docs, n=3, threshold=0.8, plan="prefix")
    assert _pairs_set(forced) == _pairs_set(
        ngram_jaccard_auto(even_docs, n=3, threshold=0.8, plan="brute")
    )
    with pytest.raises(ValueError, match="unknown jaccard plan"):
        ngram_jaccard_auto(even_docs, plan="hash")


def test_registered_gate_green(spark):
    from hnsw_spark.queries.dedup import jaccard_auto_dispatch_q

    row = jaccard_auto_dispatch_q(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["even_plan"] == "brute"
    assert row["templated_plan"] == "prefix"
    assert row["pairs_match"] is True
