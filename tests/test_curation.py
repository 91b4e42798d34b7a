"""Unit tests for curation operators on planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.curation import (
    curation_flags,
    feature_hash_embeddings,
    repetition_stats,
    stratified_sample,
    tfidf_top_terms,
    unigram_logprob,
    vocab_stats,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs on with the pack "
    "for a while is good"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_curation_flags_reasons_and_priority(spark):
    rows = [
        (0, GOOD),                          # keeps
        (1, GOOD),                          # exact dup of 0 -> duplicate
        (2, "too short"),                   # -> too_short
        (3, "!!! ??? *** !!! ??? *** !!!"), # punct soup, no stopwords
        (4, "palabras sin lexicon aqui presentes hoy ahora mismo claro bien"),
    ]
    res = {r.doc_id: r for r in curation_flags(_docs(spark, rows)).collect()}
    assert res[0].keep and res[0].drop_reason is None
    assert res[1].drop_reason == "duplicate"  # dup wins over any later rule
    assert res[2].drop_reason == "too_short"
    assert res[3].drop_reason in ("low_quality", "lang")
    assert not res[4].keep  # no lexicon hits in any language -> und
    assert res[4].drop_reason in ("low_quality", "lang")


def test_curation_flags_allowed_langs_gate(spark):
    es = "el coche que va con la de siempre por aqui cada dia sale bien y todo"
    rows = [(0, GOOD), (1, es)]
    # min_quality lowered: the quality heuristic's stopword list is English,
    # so the es doc scores ~0.45 — this test isolates the language gate
    default = {
        r.doc_id: r
        for r in curation_flags(_docs(spark, rows), min_quality=0.4).collect()
    }
    assert default[0].keep and default[1].keep  # both languages identified
    only_en = {
        r.doc_id: r
        for r in curation_flags(
            _docs(spark, rows), min_quality=0.4, allowed_langs=("en",)
        ).collect()
    }
    assert only_en[0].keep
    assert only_en[1].drop_reason == "lang"


def test_stratified_sample_deterministic_and_salted(spark):
    rows = [(i, "en" if i % 2 == 0 else "xx") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    kept1 = {r.doc_id for r in stratified_sample(df, "lang", {"en": 0.5}).collect()}
    kept2 = {r.doc_id for r in stratified_sample(df, "lang", {"en": 0.5}).collect()}
    assert kept1 == kept2  # pure function of (id, salt): re-runs agree exactly
    assert all(i % 2 == 0 for i in kept1)  # default fraction 0 drops 'xx'
    assert 60 <= len(kept1) <= 140  # ~100 of 200 'en' rows
    salted = {
        r.doc_id
        for r in stratified_sample(df, "lang", {"en": 0.5}, salt="v2").collect()
    }
    assert salted != kept1  # a new salt draws an independent sample
    everything = stratified_sample(
        df, "lang", {"en": 1.0}, default_fraction=1.0
    ).count()
    assert everything == 400  # fraction 1.0 keeps all


def test_tfidf_rare_term_outweighs_common(spark):
    import math

    d = _docs(
        spark,
        [(0, "common rare common"), (1, "common"), (2, "common")],
    )
    rows = {(r.id, r.token): r for r in tfidf_top_terms(d, top_k=2).collect()}
    r_rare, r_common = rows[(0, "rare")], rows[(0, "common")]
    assert (r_rare.tf, r_rare.df) == (1, 1)
    assert (r_common.tf, r_common.df) == (2, 3)
    assert r_rare.weight == pytest.approx(math.log(4 / 2) + 1)
    assert r_common.weight == pytest.approx(2 * (math.log(4 / 4) + 1))
    # rare (≈1.69) ranks above common-with-tf-2 (=2.0)? No: 2.0 > 1.69
    assert r_common.rank == 1 and r_rare.rank == 2
    # doc 1: single term still gets a positive weight (smoothed idf)
    assert rows[(1, "common")].weight > 0


def test_feature_hash_embeddings_feed_knn(spark):
    """Model-free text→vector bridge: identical docs embed identically
    (cosine 1), near-identical docs are each other's nearest neighbors, and
    vectors are unit-norm."""
    import numpy as np

    from hnsw_spark.operators.knn import knn_exact

    d = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "totally different words appear in this other document"),
        ],
    )
    emb = feature_hash_embeddings(d, dim=32)
    rows = {r.id: np.array(r.embedding) for r in emb.collect()}
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for v in rows.values())
    assert np.allclose(rows[0], rows[1])
    vec_df = emb.select(F.col("id").alias("vec_id"), "embedding")
    res = knn_exact(vec_df, vec_df.filter(F.col("vec_id") == 0), k=3)
    ordered = [r.id for r in res.orderBy(F.desc("score"), "id").collect()]
    assert set(ordered[:2]) == {0, 1}  # the exact duplicate ties at cosine 1
    assert ordered[2] == 2  # near-identical doc beats the unrelated one


def test_vocab_stats_counts_and_tiebreak(spark):
    d = _docs(
        spark,
        [(0, "b b a c"), (1, "b a"), (2, "zzz")],
    )
    rows = vocab_stats(d, top_n=None).collect()
    assert [(r.token, r.tf, r.df) for r in rows] == [
        ("b", 3, 2),
        ("a", 2, 2),  # tf ties broken by token ascending
        ("c", 1, 1),
        ("zzz", 1, 1),
    ]
    top = vocab_stats(d, top_n=2).collect()
    assert [r.token for r in top] == ["b", "a"]
    frequent = vocab_stats(d, top_n=None, min_doc_freq=2).collect()
    assert {r.token for r in frequent} == {"a", "b"}


def test_unigram_logprob_scores_and_empty_doc(spark):
    # corpus counts: a=3, b=1, c=1, total=5
    # q(a) = floor(ln(0.6)*1e6 + 0.5) = -510826; q(b)=q(c) = -1609438
    d = _docs(spark, [(0, "a a b"), (1, "a c"), (2, "")])
    rows = {r.doc_id: (r.n_tokens, r.logprob) for r in unigram_logprob(d).collect()}
    assert rows[0] == (3, (2 * -510826 - 1609438) / 3e6)
    assert rows[1] == (2, (-510826 - 1609438) / 2e6)
    assert rows[2] == (0, None)
    # rare-token soup scores strictly below common-token prose
    assert rows[1][1] < rows[0][1]


def test_repetition_stats_planted_fractions(spark):
    d = _docs(
        spark,
        [
            (0, "x y x y x y"),   # grams: "x y"×3 "y x"×2 -> top 3/5
            (1, "a b\na b\nc"),   # duplicate line; grams "a b"×2 of 4
            (2, "hello"),         # 1 word: no grams
        ],
    )
    rows = {
        r.doc_id: (r.n_lines, r.dup_line_frac, r.dup_word_frac, r.top_2gram_frac)
        for r in repetition_stats(d).collect()
    }
    assert rows[0] == (1, 0.0, pytest.approx(1 - 2 / 6), 0.6)
    assert rows[1] == (3, pytest.approx(1 - 2 / 3), pytest.approx(1 - 3 / 5), 0.5)
    assert rows[2] == (1, 0.0, 0.0, 0.0)


def test_pipeline_attrition_each_gate_fires(spark):
    from hnsw_spark.operators.curation import pipeline_attrition

    rows = [
        (0, GOOD),                            # kept
        (1, GOOD),                            # duplicate of 0
        (2, "too short"),                     # too_short
        (3, "the the the the the the the the the the the the"),  # repetitive
    ]
    res = {
        r.drop_reason: r.n_docs
        for r in pipeline_attrition(
            spark.createDataFrame(rows, "doc_id bigint, text string"),
            # planted corpus is tiny: loosen the flag gates so only the
            # pipeline-specific tiers decide docs 2/3
            min_quality=0.0,
        ).collect()
    }
    assert res["kept"] == 1
    assert res["duplicate"] == 1
    assert res["too_short"] == 1
    assert res["repetitive"] == 1
    # shares sum to 1
    total = sum(res.values())
    assert total == 4


def test_table_profile_nulls_distincts_and_single_scan(spark):
    from hnsw_spark.operators.profile import table_profile
    from hnsw_spark.plans.audit import plan_facts

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 8.0), (3, "b", 8.0)],
        "id bigint, s string, v double",
    )
    rows = {r.column: r for r in table_profile(df).collect()}
    assert rows["id"].n == 4 and rows["id"].n_null == 0
    assert rows["id"].n_distinct == 3
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 3.0
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_num is None  # non-numeric: no range
    assert rows["v"].n_null == 1
    assert rows["v"].min_num == 2.0 and rows["v"].max_num == 8.0
    # one corpus pass no matter how many columns are profiled
    assert plan_facts(table_profile(df)).scans == 0  # local relation
    from hnsw_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert plan_facts(table_profile(ev)).scans == 1


def test_table_profile_approx_drops_expand(spark):
    """approx=True must not plan an Expand: that's the whole point of the
    HLL path (exact multi-column distinct multiplies aggregation input by
    the number of distinct aggs; 100 TB profiling can't afford it)."""
    from hnsw_spark.operators.profile import table_profile
    from hnsw_spark.plans.audit import plan_facts
    from hnsw_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert "Expand" in plan_facts(table_profile(ev)).text
    assert "Expand" not in plan_facts(table_profile(ev, approx=True)).text


def test_dataset_split_stable_under_append_and_sums_validated(spark):
    from hnsw_spark.operators.curation import dataset_split

    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    big = spark.createDataFrame([(i,) for i in range(300)], "doc_id bigint")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_small = {r.doc_id: r.split for r in dataset_split(small, w).collect()}
    s_big = {r.doc_id: r.split for r in dataset_split(big, w).collect()}
    # append-stability: the first 100 docs keep their split in the larger corpus
    assert all(s_big[i] == s_small[i] for i in range(100))
    assert set(s_big.values()) == {"train", "val", "test"}
    # rough proportions at n=300
    n_train = sum(1 for v in s_big.values() if v == "train")
    assert 0.65 < n_train / 300 < 0.95
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        dataset_split(small, {"train": 0.5})


def test_bigram_logprob_penalizes_scrambled_text(spark):
    """The discriminative property unigram can't have: identical word
    multiset, different order -> same unigram score, lower bigram score for
    the scramble (its transitions are unseen elsewhere in the corpus)."""
    from hnsw_spark.operators.curation import bigram_logprob, unigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    # same words, shuffled deterministically
    scrambled = "mat the on dog sat the the cat rug and on the sat"
    corpus = [(0, fluent), (1, fluent), (2, fluent), (3, scrambled)]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    uni = {r.doc_id: r.logprob for r in unigram_logprob(df).collect()}
    bi = {r.doc_id: r.logprob for r in bigram_logprob(df).collect()}
    assert uni[3] == uni[0]  # unigram is order-blind
    assert bi[3] < bi[0]     # bigram is not
    # docs with <2 words: row kept, NULL logprob
    tiny = spark.createDataFrame([(0, "word")], "doc_id bigint, text string")
    r = bigram_logprob(tiny).collect()[0]
    assert r.n_bigrams == 0 and r.logprob is None


def test_strip_html_kernels(spark):
    from hnsw_spark.functions.html import markup_ratio, strip_html
    import pyspark.sql.functions as F

    rows = [
        (0, '<p>hello <b>world</b></p>'),
        (1, '<script>var x="<p>sneaky</p>";</script>real'),
        (2, 'a<br>b'),                      # tag is a word boundary
        (3, '&lt;not a tag&gt; &amp; fine'),
        (4, '<!-- hidden -->shown'),
        (5, 'plain text, no markup'),
        (6, ''),
    ]
    df = spark.createDataFrame(rows, "id bigint, raw string")
    out = {
        r.id: (r.clean, r.ratio)
        for r in df.select(
            "id",
            strip_html("raw").alias("clean"),
            markup_ratio("raw").alias("ratio"),
        ).collect()
    }
    assert out[0][0] == "hello world"
    assert out[1][0] == "real"          # script body (with nested tags) gone
    assert out[2][0] == "a b"           # not "ab"
    assert out[3][0] == '<not a tag> & fine'  # entities decode AFTER tags
    assert out[4][0] == "shown"
    assert out[5][0] == "plain text, no markup" and out[5][1] == 0.0
    assert out[6] == ("", 0.0)          # empty input: no div-by-zero
    assert out[0][1] > 0.5              # mostly markup


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from hnsw_spark.operators.curation import weighted_sample

    rows = [(i, 1 if i else 10_000_000) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, 50, weight_col="w", salt="t1")
    a = [(r.sel_rank, r.doc_id, r.weight) for r in got.collect()]
    b = [(r.sel_rank, r.doc_id, r.weight) for r in got.collect()]
    assert a == b and len(a) == 50
    assert [r[0] for r in a] == list(range(1, 51))
    # a weight 10^7 times everyone else's is effectively always drawn
    assert any(r[1] == 0 for r in a)
    # an independent salt draws a different sample
    other = {
        r.doc_id
        for r in weighted_sample(df, 50, weight_col="w", salt="t2").collect()
    }
    assert other != {r[1] for r in a}


def test_weighted_sample_rate_tracks_weight_share(spark):
    from hnsw_spark.operators.curation import weighted_sample

    # two strata, weights 9:1 — selection frequency must follow weight.
    rows = [(i, 9 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    heavy_hits = sum(
        sum(
            1
            for r in weighted_sample(df, 100, "w", salt=f"s{s}").collect()
            if r.doc_id < 500
        )
        for s in range(5)
    )
    # E[heavy per draw] ≈ 87 of 100 (without-replacement, w=9 vs 1);
    # 5 independent salts tighten the check
    assert heavy_hits / 5 > 70


def test_token_budget_select_matches_global_greedy(spark):
    """Bucket-threshold plan == brute-force global greedy, including the
    boundary-bucket cut."""
    from hnsw_spark.operators.curation import token_budget_select

    texts = [
        (i, ("the quick brown fox " * (1 + i % 7)).strip())
        for i in range(60)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = token_budget_select(docs, budget_fraction=0.5).collect()
    rows = sorted(out, key=lambda r: (-r.quality, r.doc_id))
    budget = sum(r.tokens for r in rows) // 2
    cum, want = 0, {}
    for r in rows:
        cum += r.tokens
        want[r.doc_id] = cum <= budget
    assert {r.doc_id: r.selected for r in out} == want
    assert 0 < sum(r.selected for r in out) < len(out)


def test_token_budget_select_all_fit(spark):
    from hnsw_spark.operators.curation import token_budget_select

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e")], "doc_id long, text string"
    )
    out = token_budget_select(docs, budget_fraction=1.0).collect()
    assert all(r.selected for r in out)


def test_feature_hash_embeddings_tokens_col_parity(spark):
    """The pre-tokenized path (chunk_documents with_tokens +
    feature_hash_embeddings tokens_col) is row-identical to embedding the
    reassembled chunk_text — the words()-idempotence contract the
    chunk_pooled_embeddings query now rides.  Fixture exercises the edge
    cases of the argument: empty doc (words('') == ['']), ragged tail
    chunk, multi-space text, and an exactly-chunk-sized doc."""
    from hnsw_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "Alpha   beta\tGAMMA  delta epsilon"),
            (2, " ".join(f"tok{i}" for i in range(11))),
            (3, " ".join(f"w{i}" for i in range(4))),
        ],
        "doc_id long, text string",
    )
    ch = chunk_documents(docs, chunk_size=4, overlap=1, with_tokens=True)
    # the token slice re-splits to itself (modulo the empty-token rows the
    # embed path filters)
    both = ch.select("chunk_text", "chunk_tokens").collect()
    for r in both:
        resplit = [t for t in r.chunk_text.lower().split() if t != ""]
        assert resplit == [t for t in r.chunk_tokens if t != ""]
    keyed = ch.select(
        (F.col("doc_id") * 100 + F.col("chunk_id")).alias("cid"),
        "chunk_text",
        "chunk_tokens",
    )
    via_text = feature_hash_embeddings(
        keyed, dim=16, text_col="chunk_text", id_col="cid"
    )
    via_tokens = feature_hash_embeddings(
        keyed, dim=16, tokens_col="chunk_tokens", id_col="cid"
    )
    a = {r.id: list(r.embedding) for r in via_text.collect()}
    b = {r.id: list(r.embedding) for r in via_tokens.collect()}
    assert a == b


def test_curation_flags_carry_cols_parity(spark):
    """carry_cols threads input columns through the flags unchanged: the
    carried frame equals the default output joined back to the input on
    doc_id (the join-back shape the pipeline queries replaced), and the
    flag columns themselves are byte-identical.  Colliding names raise."""
    from hnsw_spark.operators.curation import curation_flags

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog", 7),
            (1, "the quick brown fox jumps over the lazy dog", 8),  # dup
            (2, "short", 9),
            (3, "", 10),
        ],
        "doc_id long, text string, extra int",
    )
    default = curation_flags(docs)
    carried = curation_flags(docs, carry_cols=("text", "extra"))
    assert carried.columns == default.columns + ["text", "extra"]
    joined = {
        r.doc_id: r
        for r in default.join(
            docs.select("doc_id", "text", "extra"), "doc_id"
        ).collect()
    }
    got = {r.doc_id: r for r in carried.collect()}
    assert got.keys() == joined.keys()
    for k in got:
        assert got[k] == joined[k]
    with pytest.raises(ValueError, match="carry_cols"):
        curation_flags(docs, carry_cols=("keep",))
    with pytest.raises(ValueError, match="carry_cols"):
        curation_flags(docs, carry_cols=("doc_id",))
