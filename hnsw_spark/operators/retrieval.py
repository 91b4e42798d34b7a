"""Rank-fusion retrieval operators.

Hybrid search — fusing a vector arm (embedding similarity) with a text arm
(lexical overlap) — is the standard modern retrieval stack; reciprocal rank
fusion (RRF, Cormack et al. 2009) is the fusion rule that needs no score
calibration between arms: ``score(d) = Σ_arms 1/(k + rank_arm(d))``.

Scale design: each arm is already a ranked DataFrame (rank = dense 1-based);
fusion is a full-outer join on the doc id — one shuffle on the id, arm count
is small and static.  Absent ranks contribute 0 (the document simply wasn't
retrieved by that arm), which is RRF's standard missing-list handling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_tokens: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 document scores for a token-set query → (id, bm25).

    ``query_tokens`` is a DataFrame[token] (deduplicated internally).  Shape:
    one explode over the corpus feeds BOTH the doc-length table and the
    matched-term tf table (the query token set is broadcast, so non-query
    terms drop before any shuffle); document frequency is derived from the
    tf table (one row per matching doc) and is |q| rows, broadcast into the
    per-term scoring join.  The final per-doc sum uses fixed-point
    quantization (``dquant``) so the score is engine-invariant regardless of
    term summation order — see operators/evaluation.py.

    idf = ln((N − df + 0.5)/(df + 0.5) + 1)  (the standard non-negative
    Robertson–Spärck Jones smoothing); term = idf · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))."""
    from hnsw_spark.plans.cachereg import owned_persist

    tok, dlen, stats = bm25_corpus(docs, text_col, id_col)
    # three consumers read the corpus explode (the matched-term tf join,
    # the dlen join, and stats via dlen) and Spark does not CSE shared
    # subtrees — without the persists the corpus regexp-tokenized once per
    # consumer.  Library-owned (release_caches() frees them); dlen is
    # doc-count-sized, tok is the one unavoidable corpus-sized frame.
    tok = owned_persist(tok)
    dlen = owned_persist(dlen)
    return bm25_scores_from(tok, dlen, stats, query_tokens, k1, b)


def bm25_corpus(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tok, dlen, stats) — the corpus-side frames every BM25 pass needs.
    Build once and share across passes (PRF runs two; a query service runs
    thousands): ``tok`` is the one corpus explode, ``dlen``/``stats``
    derive from it.  Callers that reuse them should ``persist`` ``tok``."""
    from hnsw_spark.functions.text import words

    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(words(text_col)).alias("token")
    ).filter(F.col("token") != "")
    dlen = tok.groupBy("id").agg(F.count("*").alias("dl"))
    stats = dlen.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    return tok, dlen, stats


def bm25_scores_from(
    tok: DataFrame,
    dlen: DataFrame,
    stats: DataFrame,
    query_tokens: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scoring pass over prebuilt corpus frames (see ``bm25_corpus``)."""
    from hnsw_spark.operators.evaluation import dquant

    qtok = F.broadcast(query_tokens.select("token").distinct())
    qtf = tok.join(qtok, "token").groupBy("id", "token").agg(
        F.count("*").alias("tf")
    )
    qdf = qtf.groupBy("token").agg(F.count("*").alias("df"))
    per_term = (
        qtf.join(F.broadcast(qdf), "token")
        .join(dlen, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    term = (idf * (F.col("tf") * (k1 + 1.0))) / denom
    return (
        per_term.select("id", dquant(term, 6).alias("_q"))
        .groupBy("id")
        .agg((F.sum("_q").cast("double") / F.lit(1e6)).alias("bm25"))
    )


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked arms into (id, rrf) by reciprocal rank: each arm is a
    DataFrame[(id_col, rank_col)] with 1-based ranks; a doc absent from an
    arm contributes nothing for that arm."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    scored = [
        df.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(f"_s{i}"),
        )
        for i, df in enumerate(arms)
    ]
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), scored)
    rrf = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"_s{i}"), F.lit(0.0)),
        range(1, len(arms)),
        F.coalesce(F.col("_s0"), F.lit(0.0)),
    )
    return joined.select("id", rrf.alias("rrf"))


def diversify_mmr(
    candidates: DataFrame,
    pair_sims: DataFrame,
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
    scale: int = 9,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick, per query, the candidate maximizing
    ``λ·relevance − (1−λ)·max_similarity_to_already_picked`` — the standard
    diversity pass between retrieval and an LLM context window (near-dup
    passages waste the token budget that MMR reclaims).

    Inputs: ``candidates`` = DataFrame[(query_id, id, rel)] — a SHORTLIST
    (top-R from the exact/ANN tier, R ~ tens); ``pair_sims`` =
    DataFrame[(query_id, id_a, id_b, sim)] — candidate-candidate
    similarities within each query's shortlist (R² rows/query).

    Exactness design: greedy argmax chains are where cross-engine float
    drift compounds — one 1-ulp flip at step 3 changes every later pick.
    So the operator quantizes rel and sim to ``10^-scale`` fixed-point
    BIGINTs IN CATALYST (the same kernels the SQL oracle reproduces
    hash-exactly), and the greedy loop — an applyInPandas per query group,
    numpy integer matrix, zero Python-per-row — compares only integers
    with (score DESC, id ASC) tie-breaks.  λ is the rational lam_num/lam_den
    so scores stay integral: score_q = lam_num·rel_q − (lam_den−lam_num)·max_sim_q.

    Scale: the corpus never enters — both inputs are Q×R(²) shortlist
    frames; the groupBy(query_id) shuffle carries R² skinny rows per query
    and each group's greedy is O(k·R) numpy.

    Returns DataFrame[(query_id, id, mmr_rank, score_q)] — score_q is the
    integral MMR score at scale ``10^-scale·lam_den`` (divide to taste).
    """
    import pandas as pd

    from hnsw_spark.operators.evaluation import dquant

    cand_q = candidates.select(
        F.col("query_id").cast("long"),
        F.col("id").cast("long"),
        dquant("rel", scale).alias("rel_q"),
    )
    sims_q = pair_sims.select(
        F.col("query_id").cast("long"),
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        dquant("sim", scale).alias("sim_q"),
    )
    sim_lists = sims_q.groupBy(
        F.col("query_id").alias("qid"), F.col("id_a").alias("aid")
    ).agg(F.collect_list(F.struct("id_b", "sim_q")).alias("_sims"))
    merged = cand_q.join(
        sim_lists,
        (cand_q["query_id"] == sim_lists["qid"]) & (cand_q["id"] == sim_lists["aid"]),
        "left",
    ).select("query_id", "id", "rel_q", "_sims")

    pen_num = lam_den - lam_num

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("id").reset_index(drop=True)
        n = len(pdf)
        ids = pdf["id"].to_numpy()
        rel = pdf["rel_q"].to_numpy(dtype=np.int64)
        index = {v: i for i, v in enumerate(ids)}
        sim = np.zeros((n, n), dtype=np.int64)
        for i, lst in enumerate(pdf["_sims"]):
            if lst is None:
                continue
            for entry in lst:
                j = index.get(entry["id_b"])
                if j is not None:
                    sim[i, j] = entry["sim_q"]
        picked, max_sim = [], np.zeros(n, dtype=np.int64)
        alive = np.ones(n, dtype=bool)
        out = []
        for step in range(1, min(k, n) + 1):
            score = lam_num * rel - (pen_num * max_sim if picked else 0)
            score = np.where(alive, score, np.iinfo(np.int64).min)
            # argmax with id-asc tie-break: ids are sorted, argmax takes first
            best = int(np.argmax(score))
            picked.append(best)
            alive[best] = False
            max_sim = np.maximum(max_sim, sim[:, best])
            out.append((int(pdf["query_id"].iloc[0]), int(ids[best]), step,
                        int(score[best])))
        return pd.DataFrame(out, columns=["query_id", "id", "mmr_rank", "score_q"])

    return merged.groupBy("query_id").applyInPandas(
        greedy, "query_id long, id long, mmr_rank int, score_q long"
    )


def prf_expansion_terms(
    docs: DataFrame,
    query_tokens: DataFrame,
    feedback_k: int = 10,
    n_terms: int = 4,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback expansion terms (Rocchio/RM-style): run
    BM25 for the seed query, take the top ``feedback_k`` documents, and
    rank THEIR tokens by fixed-point tf·idf mass — Σ tf over the feedback
    docs times the same Robertson idf BM25 uses — excluding the seed
    tokens.  Returns DataFrame[(token, score_fp, rank)] of the top
    ``n_terms`` expansion candidates.

    Exactness: idf is floor-quantized to 1e-6 BEFORE the tf multiply, so
    score_fp = tf_total · idf_fp is pure BIGINT and the (score DESC, token
    ASC) cut is engine-invariant.  Scale shape: the feedback set is
    ``feedback_k`` ids broadcast into the exploded corpus; the only
    corpus-sized aggregates are the df table (one groupBy the BM25 pass
    already needs) and the tf explode it shares.  Pass ``corpus`` (a
    persisted ``bm25_corpus`` triple) to share the one corpus explode with
    the caller's own scoring passes — the PRF query does, cutting three
    corpus explodes to one."""
    from hnsw_spark.operators.evaluation import dquant

    seed = F.broadcast(query_tokens.select("token").distinct())
    tok, dlen, stats = (
        corpus if corpus is not None else bm25_corpus(docs, text_col, id_col)
    )
    scores = bm25_scores_from(tok, dlen, stats, seed, k1, b)
    fb = F.broadcast(
        scores.orderBy(F.col("bm25").desc(), "id").limit(feedback_k).select("id")
    )
    # stats (from the shared bm25_corpus triple) already carries n_docs —
    # re-aggregating dlen here would add a pass over the per-doc frame
    n_docs_df = stats.select("n_docs")
    df_all = tok.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tf_fb = (
        tok.join(fb, "id")
        .join(seed.withColumnRenamed("token", "_seed"),
              F.col("token") == F.col("_seed"), "left_anti")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf_total"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf_fb.join(df_all, "token")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "token",
            (F.col("tf_total") * dquant(idf, 6)).alias("score_fp"),
        )
    )
    w_cut = scored.orderBy(F.col("score_fp").desc(), "token").limit(n_terms)
    from pyspark.sql import Window

    win = Window.orderBy(F.col("score_fp").desc(), "token")
    return w_cut.withColumn("rank", F.row_number().over(win)).select(
        "token", "score_fp", "rank"
    )


def phrase_match(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval over a positional token index →
    (doc_id, n_occurrences, first_pos), first_pos 1-based.

    The positional-inverted-index primitive BM25 cannot express: a
    document matches only where the phrase's tokens occur CONSECUTIVELY.
    Method: posexplode the token array, keep only the phrase's tokens
    (the filter prunes before any shuffle — for a k-token phrase over a
    V-term vocabulary this drops ~(1 - k/V) of positions at the scan),
    then chain equi-joins on (id, pos - i): token i must sit exactly i
    places after token 0.  Every join is co-partitioned on the same
    (id, aligned-position) key, so a k-token phrase costs one shuffle of
    the phrase-token positions reused k-1 times, never a corpus scan per
    token.
    """
    from hnsw_spark.functions.text import words

    toks = phrase.strip().lower().split()
    if not toks:
        raise ValueError("phrase must contain at least one token")
    pos = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(words(text_col)).alias("pos0", "tok"),
    ).filter(F.col("tok").isin(toks))
    if len(toks) > 1:
        # Spark does not common-subexpression-eliminate the shared subtree:
        # without this persist each of the k per-token branches re-scans and
        # re-explodes the corpus.  The cached frame holds only the phrase's
        # own token positions (~k/V of all positions), so this is what makes
        # the "one corpus explode total" cost claim true in the compiled plan.
        # Library-owned (README "Cache ownership"); release_caches() frees it.
        from hnsw_spark.plans.cachereg import owned_persist

        pos = owned_persist(pos)
    base = pos.filter(F.col("tok") == toks[0]).select("id", F.col("pos0").alias("p"))
    for i, t in enumerate(toks[1:], start=1):
        nxt = pos.filter(F.col("tok") == t).select(
            "id", (F.col("pos0") - i).alias("p")
        )
        base = base.join(nxt, ["id", "p"])
    return base.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        (F.min("p") + 1).cast("bigint").alias("first_pos"),
    ).select(F.col("id").alias(id_col), "n_occurrences", "first_pos")
