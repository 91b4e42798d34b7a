"""Unit tests for text-analysis and dedup operators on planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.functions.text import lang_id, shingles, words
from hnsw_spark.operators.dedup import (
    embedding_neardup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    row = df.select(shingles("text", 3).alias("s"), words("text").alias("w")).first()
    assert row.s == []
    assert row.w == ["one", "two"]


def test_exact_dedup_groups_normalized_copies(spark):
    d = _docs(
        spark,
        ["Hello   World", "hello world", "HELLO\tWORLD", "something else"],
    )
    res = {r.canonical_id: r for r in exact_dedup(d).collect()}
    assert res[0].n_copies == 3  # three whitespace/case variants collapse
    assert res[3].n_copies == 1


def test_ngram_jaccard_identical_docs(spark):
    d = _docs(spark, ["a b c d e", "a b c d e", "x y z w q"])
    pairs = ngram_jaccard_pairs(d, n=2).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b) == (0, 1)
    assert p.jaccard == pytest.approx(1.0)


def test_minhash_identical_signatures_and_lsh_recovers_pair(spark):
    near_a = "the quick brown fox jumps over the lazy dog again and again"
    near_b = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely different words about spark engines and columns here"
    d = _docs(spark, [near_a, near_b, other])
    sig = {r.id: r for r in minhash_signatures(d, num_perm=16).collect()}
    same = sum(sig[0][f"m{i}"] == sig[1][f"m{i}"] for i in range(16))
    diff = sum(sig[0][f"m{i}"] == sig[2][f"m{i}"] for i in range(16))
    assert same > diff  # signature similarity tracks Jaccard
    pairs = lsh_candidate_pairs(d, num_perm=16, bands=8).collect()
    assert any((p.id_a, p.id_b) == (0, 1) for p in pairs)
    assert not any({p.id_a, p.id_b} == {0, 2} for p in pairs)


def test_simhash_identical_docs_equal_fingerprint(spark):
    d = _docs(spark, ["alpha beta gamma", "alpha  BETA gamma", "unrelated tokens xyz"])
    s = {r.id: r.simhash for r in simhash(d, bits=16).collect()}
    assert s[0] == s[1]
    assert s[0] != s[2]
    assert 0 <= s[0] < 2**16


def test_embedding_neardup_threshold(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),     # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = embedding_neardup(df, threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_lang_id_lexicons(spark):
    d = _docs(
        spark,
        [
            "the cat and the dog is here with us",
            "el perro y la casa de que con el",
            "der hund und die katze mit das auto",
            "xyzzy qwerty plugh",
        ],
    )
    res = [r.pred for r in d.select(lang_id("text").alias("pred")).orderBy("doc_id").collect()]
    assert res == ["en", "es", "de", "und"]
