"""Round-6 query batch vs pure-Python / compositional references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries():
    from hnsw_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES


def test_calibration_bins_python_reference(spark):
    out = {r["bin"]: r for r in _queries()["calibration_bins"](spark, SF).collect()}
    from hnsw_spark.operators.curation import quality_prob
    from hnsw_spark.queries.curation import _KS_A
    from hnsw_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF, "documents")
        .select(
            F.col("source").isin(*_KS_A).alias("a"),
            quality_prob("text").alias("p"),
        )
        .collect()
    )
    bins: dict[int, list] = {}
    for r in rows:
        p_fp = math.floor(r["p"] * 1_000_000.0 + 0.5)
        b = min(p_fp // 100_000, 9)
        bins.setdefault(b, []).append((0 if r["a"] else 1, p_fp))
    assert set(out) == set(bins)
    n_total = len(rows)
    ece_num = 0
    for b, members in bins.items():
        n_pos = sum(y for y, _ in members)
        sum_p = sum(p for _, p in members)
        ece_num += abs(n_pos * 1_000_000 - sum_p)
        got = out[b]
        assert (got["n"], got["n_pos"], got["sum_p_fp"]) == (
            len(members),
            n_pos,
            sum_p,
        )
        assert got["gap_fp"] == abs(n_pos * 1_000_000 - sum_p)
    for b in bins:
        assert out[b]["ece_fp"] == math.floor(
            ece_num / (n_total * 1_000_000.0) * 1_000_000.0 + 0.5
        )


def test_lsh_incremental_is_cross_split_restriction(spark):
    """Incremental candidates == the full self-join pairs restricted to
    (new, corpus) cross-split membership — no pair invented, none lost."""
    from hnsw_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_incremental_candidates,
    )
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 200)
    new_b = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    knobs = dict(num_perm=8, bands=4, n=3, max_bucket=None)
    inc = {
        (r["new_id"], r["corpus_id"]): r["n_bands"]
        for r in lsh_incremental_candidates(new_b, corpus, **knobs).collect()
    }
    full = {}
    for r in lsh_candidate_pairs(docs, **knobs).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 2 == 1 and b % 2 == 0:
            full[(a, b)] = r["n_bands"]
        elif b % 2 == 1 and a % 2 == 0:
            full[(b, a)] = r["n_bands"]
    assert inc == full


def test_lsh_incremental_never_pairs_within_batch(spark):
    from hnsw_spark.operators.dedup import lsh_incremental_candidates
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 100)
    # duplicate texts INSIDE the new batch must not pair with each other
    new_b = docs.limit(0).union(docs.filter(F.col("doc_id").isin(1, 3)))
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    out = lsh_incremental_candidates(
        new_b, corpus, num_perm=8, bands=4, n=3
    ).collect()
    for r in out:
        assert r["new_id"] % 2 == 1 and r["corpus_id"] % 2 == 0


def test_prf_expansion_excludes_seed_and_ranks_by_mass(spark):
    from hnsw_spark.operators.retrieval import prf_expansion_terms
    from hnsw_spark.functions.text import words
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    qtok = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.slice(words("text"), 1, 4)).alias("token"))
        .distinct()
    )
    seed = {r["token"] for r in qtok.collect()}
    exp = prf_expansion_terms(docs, qtok, feedback_k=10, n_terms=4).collect()
    assert 0 < len(exp) <= 4
    assert [r["rank"] for r in sorted(exp, key=lambda r: r["rank"])] == list(
        range(1, len(exp) + 1)
    )
    for r in exp:
        assert r["token"] not in seed
        assert r["score_fp"] > 0
    # ranks follow (score DESC, token ASC)
    ordered = sorted(exp, key=lambda r: (-r["score_fp"], r["token"]))
    assert [r["token"] for r in ordered] == [
        r["token"] for r in sorted(exp, key=lambda r: r["rank"])
    ]


def test_passage_maxpool_reference(spark):
    out = _queries()["passage_search_maxpool"](spark, SF).collect()
    from hnsw_spark.functions.text import words
    from hnsw_spark.operators.packing import chunk_documents
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    ql = set(
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.slice(words("text"), 1, 4)).alias("t"))
        .toPandas()["t"]
    )
    chunks = chunk_documents(docs, chunk_size=128, overlap=32).select(
        "doc_id", "chunk_id", "chunk_text"
    ).collect()
    best: dict[int, tuple] = {}
    for c in chunks:
        toks = set(c["chunk_text"].strip().lower().split())
        score = len(toks & ql)
        key = c["doc_id"]
        cand = (-score, c["chunk_id"])
        if key not in best or cand < best[key]:
            best[key] = cand
    ranked = sorted(
        ((-(s_neg), cid, did) for did, (s_neg, cid) in best.items()),
        key=lambda t: (-t[0], t[2]),
    )[:10]
    got = sorted(out, key=lambda r: r["rank"])
    assert [(r["chunk_score"], r["best_chunk"], r["doc_id"]) for r in got] == [
        (s, c, d) for s, c, d in ranked
    ]


def _ref_kmeans(vectors: dict[int, list[float]], k: int, iterations: int):
    """Pure-python quantized Lloyd's mirroring operators/kmeans.py."""
    xf = {
        i: [math.floor(e * 1_000_000.0 + 0.5) for e in v]
        for i, v in vectors.items()
    }
    cents = {i: list(xf[i]) for i in sorted(xf) if i < k}

    def assign():
        out = {}
        for i, x in xf.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, c)), cl)
                for cl, c in cents.items()
            )
            out[i] = (best[1], best[0])
        return out

    a = assign()
    for _ in range(iterations - 1):
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for i, (cl, _) in a.items():
            counts[cl] = counts.get(cl, 0) + 1
            s = sums.setdefault(cl, [0] * len(xf[i]))
            for j, v in enumerate(xf[i]):
                s[j] += v
        cents = {
            cl: [math.floor(s[j] / counts[cl]) for j in range(len(s))]
            for cl, s in sums.items()
        }
        a = assign()
    return a


def test_kmeans_lloyd_matches_python_reference(spark):
    from hnsw_spark.operators.kmeans import kmeans_lloyd
    from hnsw_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    got = {
        r["id"]: (r["cluster"], r["d2"])
        for r in kmeans_lloyd(emb, k=4, iterations=2).collect()
    }
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.select("vec_id", "embedding").collect()
    }
    assert got == _ref_kmeans(vecs, 4, 2)


def _ref_lpa(edges: list[tuple[int, int]], nodes: list[int], rounds: int):
    nbrs: dict[int, list[int]] = {n: [] for n in nodes}
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            if not nbrs[n]:
                new[n] = labels[n]
                continue
            counts: dict[int, int] = {}
            for m in nbrs[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            new[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    return labels


def test_label_propagation_matches_python_reference(spark):
    import random

    from hnsw_spark.operators.lpa import label_propagation

    rng = random.Random(7)
    nodes = list(range(60))
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    e_df = spark.createDataFrame(edges, ["id_a", "id_b"])
    n_df = spark.createDataFrame([(n,) for n in nodes], ["node"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(e_df, n_df, rounds=3).collect()
    }
    assert got == _ref_lpa(edges, nodes, 3)


def test_embedding_drift_bounds(spark):
    rows = _queries()["embedding_drift_cohorts"](spark, SF).collect()
    from hnsw_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    sizes = {
        (r["label"], r["cohort"]): r["n"]
        for r in emb.select(
            "label", (F.col("vec_id") % 2).alias("cohort")
        )
        .groupBy("label", "cohort")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert -1_000_000 <= r["drift_cos_fp"] <= 1_000_000
        assert r["n_a"] == sizes[(r["label"], 0)]
        assert r["n_b"] == sizes[(r["label"], 1)]


def test_npy_writer_reader_numpy_cross_check(tmp_path, spark):
    """Our NPY writer must be readable by numpy, and our reader must read
    numpy's own writer — both directions, plus limit/offset pushdown and
    corrupt-input rejection."""
    import numpy as np

    from hnsw_spark.sources.npy import decode_npy, read_npy, write_npy

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((37, 5)).astype(np.float32)

    ours = str(tmp_path / "ours.npy")
    write_npy(ours, mat)
    assert np.array_equal(np.load(ours), mat)

    theirs = str(tmp_path / "theirs.npy")
    np.save(theirs, mat)
    ids, dec = decode_npy(open(theirs, "rb").read())
    assert np.array_equal(dec, mat) and list(ids) == list(range(37))

    out = read_npy(spark, ours, limit=10, offset=5).orderBy("vec_id").collect()
    assert [r["vec_id"] for r in out] == list(range(5, 15))
    assert np.array_equal(
        np.stack([np.array(r["embedding"], np.float32) for r in out]),
        mat[5:15],
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="magic"):
        decode_npy(b"NOTNPY" + b"\x00" * 64)
    fortran = str(tmp_path / "f.npy")
    np.save(fortran, np.asfortranarray(mat))
    with _pytest.raises(ValueError, match="fortran"):
        decode_npy(open(fortran, "rb").read())
    with _pytest.raises(ValueError, match="2-D"):
        one_d = str(tmp_path / "one.npy")
        np.save(one_d, mat.ravel())
        decode_npy(open(one_d, "rb").read())
    with _pytest.raises(ValueError, match="dtype"):
        f8 = str(tmp_path / "f8.npy")
        np.save(f8, mat.astype(np.float64))
        decode_npy(open(f8, "rb").read())


def test_duplicate_spans_planted_quote(spark):
    """A doc that quotes a 10-word run from another must report exactly a
    10-word longest span; unrelated docs report n-1+1..smaller runs."""
    from hnsw_spark.operators.dedup import duplicate_spans

    quote = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (0, f"start {quote} end of first document content here"),
        (1, f"totally different preamble {quote} and then a different tail"),
        (2, "no overlap with anything else whatsoever in this text"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 1), (0, 2)], ["id_a", "id_b"])
    out = {
        (r["id_a"], r["id_b"]): (r["longest_span_words"], r["n_matches"])
        for r in duplicate_spans(pairs, docs, n=3).collect()
    }
    # pair (0,1): the quote is 10 words → 8 consecutive 3-gram positions
    assert out[(0, 1)][0] == 10
    assert out[(0, 1)][1] == 8
    # pair (0,2): zero matching shingles → still reported, with zeros
    # (silent omission would read as "not a candidate" to a consumer)
    assert out[(0, 2)] == (0, 0)


def test_ngram_novelty_emits_shingle_less_docs(spark):
    # < n words → no shingles: the doc must still appear, as (0, 0, NULL),
    # so consumers can tell "no data" from silent absence (ADVICE r6)
    from hnsw_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "too short"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2, 3}
    for d in (2, 3):
        assert out[d]["n_shingles"] == 0
        assert out[d]["n_unique"] == 0
        assert out[d]["novelty_fp"] is None
    assert out[1]["n_shingles"] == 2 and out[1]["novelty_fp"] == 1_000_000


def test_ngram_novelty_reference(spark):
    from hnsw_spark.operators.dedup import ngram_novelty
    from hnsw_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    sets = {}
    for d, t in texts.items():
        w = t.strip().lower().split()
        sets[d] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        } if len(w) >= 3 else set()
    df_count: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            df_count[sh] = df_count.get(sh, 0) + 1
    for d, s in sets.items():
        if not s:
            assert out[d]["novelty_fp"] is None
            continue
        uniq = sum(1 for sh in s if df_count[sh] == 1)
        assert out[d]["n_shingles"] == len(s)
        assert out[d]["n_unique"] == uniq
        assert out[d]["novelty_fp"] == (uniq * 1_000_000) // len(s)


def test_grouped_split_no_straddlers(spark):
    rows = _queries()["grouped_split_gate"](spark, SF).collect()
    assert {r["split"] for r in rows} <= {"train", "eval"}
    for r in rows:
        assert r["n_straddlers"] == 0
        assert r["n_events"] >= r["n_users"] > 0
