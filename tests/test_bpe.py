"""BPE merge learning vs the sequential pure-Python reference."""

from __future__ import annotations

from collections import Counter

from hnsw_spark.operators.bpe import bpe_train, bpe_train_py


def _freqs(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        c.update(t.strip().lower().split())
    return dict(c)


def _spark_merges(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train(df, **kw).orderBy("merge_rank").collect()
    ]


def test_bpe_matches_reference_on_classic_corpus(spark):
    # the canonical BPE walkthrough corpus (low/lower/newest/widest family)
    texts = ["low low low low low", "lower lower", "newest newest newest", "widest"]
    got = _spark_merges(spark, texts, n_merges=8, min_pair_count=1)
    want = bpe_train_py(_freqs(texts), n_merges=8, min_pair_count=1)
    assert got == want
    assert got, "expected at least one merge"


def test_bpe_overlapping_merges_left_first(spark):
    # 'aaaa' under merge (a,a) must tokenize as (aa)(aa), not a(aa)a
    texts = ["aaaa aaaa b"]
    got = _spark_merges(spark, texts, n_merges=2, min_pair_count=1)
    want = bpe_train_py(_freqs(texts), n_merges=2, min_pair_count=1)
    assert got == want
    assert got[0][1:3] == ("a", "a")
    # second merge must be (aa, aa): the fold left 2 'aa' symbols adjacent
    assert got[1][1:3] == ("aa", "aa")


def test_bpe_min_pair_count_stops_early(spark):
    texts = ["ab cd ef"]
    got = _spark_merges(spark, texts, n_merges=5, min_pair_count=2)
    assert got == []


def test_bpe_fixture_corpus_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    got = _spark_merges(spark, texts, n_merges=10)
    want = bpe_train_py(_freqs(texts), n_merges=10)
    assert got == want
