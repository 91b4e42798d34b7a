"""Prefix-filtered Jaccard join must be EXACTLY the brute pair join — the
soundness-and-completeness contract of the candidate filter."""

import pyspark.sql.functions as F

from hnsw_spark.operators.dedup import jaccard_prefix_pairs, ngram_jaccard_pairs


def _rows(df):
    return sorted(
        (r.id_a, r.id_b, r.n_common, r.size_a, r.size_b, round(r.jaccard, 9))
        for r in df.collect()
    )


def test_matches_brute_force_at_multiple_thresholds(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox leaps over the lazy dog"),
        (3, "entirely different words live in this one here"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "words live in this one entirely different here"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    for t in (0.5, 0.8):
        brute = ngram_jaccard_pairs(docs, n=2, threshold=t)
        pref = jaccard_prefix_pairs(docs, n=2, threshold=t)
        assert _rows(pref) == _rows(brute), f"threshold {t}"


def test_exact_duplicates_found(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)]
        + [(9, "nothing shared with the others at all")],
        "doc_id long, text string",
    )
    res = jaccard_prefix_pairs(docs, n=2, threshold=0.9)
    pairs = {(r.id_a, r.id_b) for r in res.collect()}
    assert pairs == {(a, b) for a in range(4) for b in range(4) if a < b}
    assert all(r.jaccard == 1.0 for r in res.collect())


def test_no_pairs_below_threshold(spark):
    docs = spark.createDataFrame(
        [(0, "one two three four"), (1, "five six seven eight")],
        "doc_id long, text string",
    )
    assert jaccard_prefix_pairs(docs, n=2, threshold=0.3).count() == 0
