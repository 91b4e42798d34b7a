"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

Learns the merge table a BPE tokenizer is made of: repeatedly count
adjacent symbol pairs across the corpus and merge the most frequent one
(Sennrich, Haddow & Birch, ACL 2016, "Neural machine translation of rare
words with subword units" — public knowledge).  Training the tokenizer is
a first-class step of a large-scale training-data pipeline; no reference
counterpart.

Scale design
------------
The classic trick makes this tractable: merges operate on the DISTINCT
word vocabulary weighted by word frequency, never on the raw corpus.  The
corpus is scanned exactly once (the word-frequency groupBy); every one of
the ``n_merges`` iterations then runs on the vocabulary frame — a
pair-count aggregation (explode of zipped shifted slices, map-side
combined) plus one argmax row collected for loop control (the
``components.py`` convention: 1-row collects steer the loop, data never
leaves the cluster).  The merge itself is a pure Catalyst ``aggregate``
fold over each word's symbol array (greedy left-to-right, matching the
sequential reference semantics), and ``localCheckpoint`` truncates the
growing lineage each round exactly as the connected-components loop does.
At 100 TB the vocabulary is ~10⁶-10⁸ rows — cluster-trivial — and the
single corpus scan dominates, as it should.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hnsw_spark.functions.text import words


def _adjacent_pairs(sym: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs of one word."""
    length = F.greatest(F.size(sym) - 1, F.lit(0))
    return F.zip_with(
        F.slice(sym, 1, length),
        F.slice(sym, 2, length),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — a fold:
    append each symbol unless the accumulator ends in ``a`` and the symbol
    is ``b``, in which case the tail is replaced by the merged token.
    (After a replacement the tail IS the merged token, so overlapping
    occurrences like 'aaa' under (a,a) merge left-first — the sequential
    BPE semantics.)"""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the one
    corpus-wide scan BPE training needs."""
    return (
        docs.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_count: int = 2,
    incremental: bool = True,
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns DataFrame[merge_rank INT, left STRING, right STRING,
    pair_count BIGINT] in merge order.  Ties break deterministically by
    (count DESC, left ASC, right ASC).  Stops early when the best pair
    falls under ``min_pair_count``.

    ``incremental=False`` is the SMALL-VOCABULARY regime: the corpus scan
    (the word-frequency aggregation — the only part that touches raw data)
    stays distributed, then the aggregated (word, freq) table is handed to
    ONE Python task that runs the sequential merge loop in-memory (guide
    §4.2: let Spark do distribution and I/O, hand the whole batch to local
    code).  Until round 13 this path re-aggregated ALL pairs via 2 Spark
    jobs per merge — ~16 s for 20 merges at fixture scale, nearly all
    per-round job/planning overhead; the in-task loop trains the same 20
    merges in milliseconds after the one corpus scan.  It is only safe
    while the distinct vocabulary fits one task (the classic BPE-training
    working set: ~10⁶ words × avg length ≈ tens of MB — fine to ~10⁷
    words); past that, use the incremental default (see below), which
    keeps every round distributed and re-counts only the words containing
    the merged pair.  Both produce identical merges (the in-task loop IS
    the pinned sequential reference; parity-pinned in tests/test_bpe.py).
    """
    spark = docs.sparkSession
    if not incremental:
        # one distributed corpus scan → (word, freq); one single-task
        # mapInPandas runs the sequential reference over the aggregated
        # vocabulary — 2 jobs TOTAL instead of 2 jobs per merge
        wf = word_frequencies(docs, text_col)
        schema = "merge_rank int, left string, right string, pair_count bigint"

        def train(batches):
            import pandas as pd

            wfreq: dict[str, int] = {}
            for pdf in batches:
                for w, f in zip(pdf["word"], pdf["freq"]):
                    wfreq[w] = wfreq.get(w, 0) + int(f)
            rows = bpe_train_py(wfreq, n_merges, min_pair_count)
            yield pd.DataFrame(
                {
                    "merge_rank": [r[0] for r in rows],
                    "left": [r[1] for r in rows],
                    "right": [r[2] for r in rows],
                    "pair_count": [r[3] for r in rows],
                },
            ).astype(
                {"merge_rank": "int32", "pair_count": "int64"}
            )

        return wf.repartition(1).mapInPandas(train, schema)
    vocab = word_frequencies(docs, text_col).select(
        F.split("word", "").alias("sym"), "freq"
    )
    # lazy: the eager counts checkpoint below materializes it
    vocab = vocab.localCheckpoint(eager=False)
    # Pair counts are maintained INCREMENTALLY (the standard sequential-BPE
    # optimization, distributed): built once from the full vocabulary, then
    # each merge re-counts ONLY the words that contain the merged pair —
    # their old adjacent pairs enter the delta negatively, their re-merged
    # pairs positively — and folds the skinny delta into the running counts
    # frame.  Unaffected words (the vast majority per round at a realistic
    # vocabulary) are neither exploded nor folded again; the per-round
    # argmax reads the maintained counts frame directly.  A real 50k-merge
    # train is still ``n_merges`` sequential driver rounds (the argmax is
    # inherently ordered), but each round's cluster work is proportional to
    # the words touched, not the vocabulary.
    counts = (
        vocab.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0].cnt < min_pair_count:
            break
        a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
        merges.append((rank, a, b, cnt))
        # adjacency test WITHOUT materializing the pair array per row: the
        # \x01-joined symbol string contains \x01a\x01b\x01 iff (a,b) are
        # adjacent somewhere in the word.  A pathological word containing
        # the \x01 separator itself is conservatively flagged hit — the
        # merge fold is a no-op on a non-matching word, so a false
        # positive only costs work, never correctness.
        sep = "\x01"
        joined = F.concat(
            F.lit(sep), F.array_join(F.col("sym"), sep), F.lit(sep)
        )
        hit = F.contains(joined, F.lit(sep + a + sep + b + sep)) | F.contains(
            F.array_join(F.col("sym"), ""), F.lit(sep)
        )
        merged = _apply_merge(F.col("sym"), a, b)
        delta = (
            vocab.filter(hit)
            .select(
                F.explode(
                    F.concat(
                        F.transform(
                            _adjacent_pairs(F.col("sym")),
                            lambda p: F.struct(
                                p["a"].alias("a"),
                                p["b"].alias("b"),
                                (-F.col("freq")).alias("d"),
                            ),
                        ),
                        F.transform(
                            _adjacent_pairs(merged),
                            lambda p: F.struct(
                                p["a"].alias("a"),
                                p["b"].alias("b"),
                                F.col("freq").alias("d"),
                            ),
                        ),
                    )
                ).alias("pd")
            )
            .select("pd.a", "pd.b", F.col("pd.d").alias("cnt"))
        )
        counts = (
            counts.unionByName(delta)
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .localCheckpoint()
        )
        # conditional rewrite: the (expensive) greedy merge fold runs only
        # on rows where the pair occurs; codegen evaluates the other branch
        vocab = vocab.select(
            F.when(hit, merged).otherwise(F.col("sym")).alias("sym"), "freq"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_count bigint"
    )


def bpe_train_py(
    word_freq: dict[str, int], n_merges: int = 20, min_pair_count: int = 2
) -> list[tuple[int, str, str, int]]:
    """Sequential pure-Python reference of ``bpe_train`` (test oracle)."""
    vocab = [(list(w), f) for w, f in word_freq.items()]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        new_vocab = []
        for sym, f in vocab:
            out: list[str] = []
            for s in sym:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab.append((out, f))
        vocab = new_vocab
    return merges


def bpe_encode_words(
    vocab: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Encode each distinct word with a trained merge table: split to
    characters, then replay every merge in learned rank order (each one the
    same greedy left-to-right Catalyst fold used during training, so
    encode(train corpus) reproduces the training segmentation exactly).

    The merge table is driver-side (it is ``n_merges`` rows — tiny by
    construction), so the whole encoder is one scan-stage column expression:
    no shuffle, no UDF, and at 100 TB it runs over the DISTINCT word frame
    (10⁶–10⁸ rows), never the raw corpus.

    Returns ``vocab`` plus ``tokens array<string>``.
    """
    sym = F.split(F.col(word_col), "")
    for a, b in merges:
        sym = _apply_merge(sym, a, b)
    return vocab.withColumn("tokens", sym)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained BPE merge table.

    Two-level plan mirroring ``bpe_train``'s scale design: encode the
    distinct word vocabulary once (``bpe_encode_words``), then broadcast-
    join the segmentation back onto the position-indexed corpus words and
    reassemble each document in order — the corpus is scanned once and
    never shuffled (the per-doc groupBy shuffles (id, pos, tokens) rows,
    whose volume is the tokenized corpus itself; at larger vocabularies the
    broadcast degrades gracefully to a shuffle join by dropping the hint).

    Returns DataFrame[id_col, tokens array<string>, n_tokens int].
    """
    wpos = docs.select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "word")
    ).filter(F.col("word") != "")
    vocab = wpos.select("word").distinct()
    encoded = bpe_encode_words(vocab, merges)
    return (
        wpos.join(F.broadcast(encoded), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens").cast("int"))
    )
