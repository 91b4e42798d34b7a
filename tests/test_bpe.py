"""BPE merge learning vs the sequential pure-Python reference."""

from __future__ import annotations

import pytest

from collections import Counter

from hnsw_spark.operators.bpe import bpe_train, bpe_train_py

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)


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


def _encode_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Sequential reference encoder: replay merges in rank order, each one
    greedy left-to-right (the same semantics as training's merge step)."""
    sym = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in sym:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        sym = out
    return sym


def test_bpe_encode_words_matches_sequential_reference(spark):
    from pyspark.sql import functions as F

    from hnsw_spark.operators.bpe import bpe_encode_words

    texts = ["low low low low low", "lower lower", "newest newest newest", "widest"]
    merges = [
        (a, b) for _, a, b, _ in bpe_train_py(_freqs(texts), 8, min_pair_count=1)
    ]
    vocab = spark.createDataFrame(
        [(w,) for w in sorted(_freqs(texts))], "word string"
    )
    got = {
        r.word: list(r.tokens)
        for r in bpe_encode_words(vocab, merges).collect()
    }
    for w in _freqs(texts):
        assert got[w] == _encode_py(w, merges), w
        assert "".join(got[w]) == w


def test_bpe_encode_reassembles_documents_in_order(spark):
    from hnsw_spark.operators.bpe import bpe_encode

    texts = ["low lower low", "newest widest", "lower newest lower low"]
    merges = [
        (a, b) for _, a, b, _ in bpe_train_py(_freqs(texts), 6, min_pair_count=1)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        want: list[str] = []
        for w in t.split():
            want.extend(_encode_py(w, merges))
        assert got[i][0] == want, t
        assert got[i][1] == len(want)


def test_bpe_encode_with_no_merges_is_character_split(spark):
    from hnsw_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(1, "ab ba")], "doc_id long, text string")
    rows = bpe_encode(docs, []).collect()
    assert list(rows[0].tokens) == ["a", "b", "b", "a"]
