"""Sequence packing and deterministic sharding — the "write side" of a
training-data pipeline: after curation/dedup, documents are tokenized,
packed into fixed-token-budget training sequences, and sharded into
equal-ish output files for the data loader.

Both operators are deterministic pure functions of the row ids (md5-based,
the same engine-portable hash as curation.stratified_sample), so they are
reproducible across runs, engines, and partitionings — a re-run of the
pipeline produces byte-identical shard assignments, which is what makes
incremental re-curation and train/job restarts safe at 100 TB.

Scale shape:
- ``assign_shards`` is shuffle-free: shard_id is a per-row hash expression
  that pushes into the scan stage.  Writing then repartitions BY that column
  (one shuffle, width = num_shards) so each output file is one shard.
- ``pack_sequences`` packs WITHIN shards: the cumulative-sum window
  partitions by shard_id, so the sort is num_shards-way parallel and no
  global total order exists anywhere in the plan.  (A single global
  greedy pack would serialize the corpus through one partition — the
  classic 100 TB anti-plan.)  Packing quality is unaffected: bins are
  budget-sized everywhere except one ragged tail bin per shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hnsw_spark.functions.text import bpe_token_count

_HASH_SPACE = 1 << 32


def shard_id(col: Column | str, num_shards: int, salt: str = "shard") -> Column:
    """Deterministic engine-portable shard assignment in [0, num_shards):
    md5 of (id, salt) → 32-bit int → mod.  Identical in DuckDB via
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % num_shards``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(c.cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % num_shards
    ).alias("shard_id")


def assign_shards(
    df: DataFrame, num_shards: int, id_col: str = "doc_id", salt: str = "shard"
) -> DataFrame:
    """Add a deterministic ``shard_id`` column — a pure row expression, no
    shuffle until the caller repartitions to write."""
    return df.withColumn("shard_id", shard_id(id_col, num_shards, salt))


def write_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> None:
    """Write ``df`` as parquet partitioned by deterministic shard:
    ``path/shard_id=K/``.  One shuffle (repartition on shard_id) so each
    shard directory is written by one task — at scale, bump num_shards
    rather than letting single shards exceed executor memory."""
    out = assign_shards(df, num_shards, id_col, salt)
    (
        out.repartition(num_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    num_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """Greedy contiguous sequence packing: assign each document to the
    training bin containing its start offset.

    Within each deterministic shard, documents are laid out in id order and
    token counts accumulate; a document starting at offset ``s`` lands in
    bin ``floor(s / budget)`` of its shard.  Output:
    (doc_id, shard_id, n_tokens, bin_id, offset_in_bin, overflows) where
    ``overflows`` marks documents that straddle a bin boundary (the data
    loader's cue to truncate or wrap).

    This is the streaming-concat packing used by most LLM data loaders
    (documents concatenated, chopped every ``budget`` tokens) — expressed as
    ONE window cumulative sum partitioned by shard, so the plan is a single
    num_shards-way shuffle + sort, never a global order."""
    toks = (
        F.col(token_col)
        if token_col
        else bpe_token_count(text_col)
    ).cast("long")
    base = df.select(
        F.col(id_col),
        shard_id(id_col, num_shards, salt),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_start = base.withColumn(
        "_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return with_start.select(
        id_col,
        "shard_id",
        "n_tokens",
        F.floor(F.col("_start") / budget).alias("bin_id"),
        (F.col("_start") % budget).alias("offset_in_bin"),
        ((F.col("_start") % budget) + F.col("n_tokens") > budget).alias(
            "overflows"
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the long-
    document preparation step (pretraining context windows, RAG passages)
    complementary to whole-doc ``pack_sequences``.

    Chunk c of a doc covers word offsets [c·stride, c·stride + chunk_size)
    with stride = chunk_size − overlap; the final chunk is the ragged tail
    and every word lands in ≥1 chunk.  Output: (doc_id, chunk_id,
    chunk_start, n_chunk_tokens, chunk_text).

    Pure scan-stage relational expansion: tokenize once, explode a
    ``sequence`` of chunk starts, slice the bound token array — no
    shuffle, no UDF, so it pipelines inside whole-stage codegen at any
    corpus size.  Empty docs keep one chunk row (chunk_id 0, empty text —
    the engine-wide ``words('')`` convention is a single empty token), so
    downstream joins never lose documents."""
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_size ({chunk_size})"
        )
    stride = chunk_size - overlap
    from hnsw_spark.functions.text import words
    from hnsw_spark.plans.parallelism import fan_out_narrow

    df = fan_out_narrow(df)
    base = df.select(
        F.col(id_col).alias("doc_id"), words(text_col).alias("_w")
    ).select("doc_id", "_w", F.size("_w").alias("_n"))
    # chunk starts: 0, stride, 2*stride, ... while start < n (at least one)
    # explicit floor, not a bare cast: Spark's double→long cast truncates
    # while DuckDB's rounds, so floor is the only division both engines
    # agree on (floor also handles the empty-doc −1/stride case)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor((F.col("_n") - 1) / stride).cast("long") * stride,
            F.lit(0),
        ),
        F.lit(stride),
    )
    exploded = base.select(
        "doc_id",
        "_w",
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    piece = F.slice(
        F.col("_w"), F.col("chunk_start") + 1, F.lit(chunk_size)
    )
    cols = [
        F.col("doc_id"),
        F.col("chunk_id"),
        F.col("chunk_start"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    ]
    if with_tokens:
        # the raw token slice, for consumers that would otherwise
        # re-tokenize chunk_text (words() ∘ array_join(' ') is the
        # identity on a words() slice: tokens are \s-free and already
        # lowercased, and the empty slice round-trips to zero non-empty
        # tokens either way).  Catalyst prunes the chunk_text join when
        # the consumer selects only chunk_tokens, so the string is never
        # materialized on that path.
        cols.append(piece.alias("chunk_tokens"))
    return exploded.select(*cols)


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic global training order: every row gets a unique
    0-based ``pos`` drawn from the total order (bucket, md5(id‖salt), id) —
    a reproducible corpus-wide shuffle (same salt → same order on any
    engine or partitioning; new salt → an independent permutation), the
    step that serializes a curated corpus into training sequence.

    Scale shape: NOT a single global sort.  Rows hash into ``n_buckets``
    buckets; each bucket sorts locally under a row_number window (one
    shuffle, n_buckets-way parallel), and global positions are local
    positions plus per-bucket offsets — an n_buckets-row aggregate whose
    running sum broadcasts back.  The classic two-level ordering: the
    heavy path never converges on one partition, and the tiny offset
    table is the only sequential state."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    bucketed = df.withColumn("_key", h).withColumn(
        "_bucket",
        F.conv(F.substring("_key", 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets),
    )
    local = F.row_number().over(
        Window.partitionBy("_bucket").orderBy("_key", id_col)
    )
    counts = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.select(
        "_bucket",
        (
            F.sum("_c").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_off"),
    ).fillna({"_off": 0})
    return (
        bucketed.withColumn("_local", local)
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("pos", (F.col("_off") + F.col("_local") - 1).cast("long"))
        .drop("_key", "_bucket", "_local", "_off")
    )


def packing_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Bin-level fill report over ``pack_sequences`` output:
    (shard_id, bin_id, n_docs, bin_tokens, fill_ratio).  ``fill_ratio``
    counts tokens STARTING in the bin against the budget, so interior bins
    of a shard hover near 1.0 (over 1.0 exactly when their last doc
    overflows into the next bin) and each shard's last bin is ragged."""
    return (
        packed.groupBy("shard_id", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.col("bin_tokens") / F.lit(float(budget)),
        )
    )


def sorted_export(
    df: DataFrame,
    order_col: str,
    num_shards: int,
    path: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Globally-ordered export: range-partition on ``order_col`` into
    ``num_shards`` shards, sort within each — reading shards in id order
    yields a TOTALLY ordered dataset without ever funneling rows through
    one task (the scalable form of ``ORDER BY`` output; Spark samples the
    key distribution to pick balanced range boundaries).

    Returns the sharded frame with a ``part_id`` column (``path`` given →
    also written as parquet, one file per range).  Ties on ``order_col``
    are sub-ordered by ``id_col`` so the layout is deterministic given the
    sampled boundaries.
    """
    from pyspark.sql.functions import spark_partition_id

    ranged = (
        df.repartitionByRange(num_shards, F.col(order_col), F.col(id_col))
        .sortWithinPartitions(order_col, id_col)
        .withColumn("part_id", spark_partition_id())
    )
    if path is not None:
        ranged.write.mode("overwrite").partitionBy("part_id").parquet(path)
    return ranged


def sorted_export_gate(
    df: DataFrame,
    order_col: str,
    num_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-gate for ``sorted_export``: one row proving total order.

    - ``n_rows``: count survives the repartition (oracle: count(*));
    - ``within_sorted``: inside every shard, each row's (order, id) is
      ≥ its predecessor (per-partition window, no global collect);
    - ``ranges_disjoint``: shard p's max key ≤ shard p+1's min key — the
      per-shard (min, max) table is ``num_shards`` rows, checked with one
      lag window over that tiny frame.

    Boundaries come from Spark's reservoir sampling, so shard SIZES are
    not oracle-pinned (nondeterministic) — the gate pins the property that
    matters: concatenating shards in part order IS the global sort.
    """
    ranged = sorted_export(df, order_col, num_shards, id_col=id_col)
    ranged = ranged.select(
        F.col(order_col).alias("_k"), F.col(id_col).alias("_id"), "part_id"
    )

    w = Window.partitionBy("part_id").orderBy("_k", "_id")
    within = ranged.withColumn(
        "_ok",
        F.coalesce(
            (F.col("_k") > F.lag("_k").over(w))
            | (
                (F.col("_k") == F.lag("_k").over(w))
                & (F.col("_id") >= F.lag("_id").over(w))
            ),
            F.lit(True),
        ),
    ).agg(
        F.count("*").alias("n_rows"), F.min("_ok").alias("within_sorted")
    )

    bounds = ranged.groupBy("part_id").agg(
        F.min("_k").alias("_lo"), F.max("_k").alias("_hi")
    )
    bw = Window.orderBy("part_id")
    disjoint = bounds.withColumn(
        "_ok",
        F.coalesce(F.lag("_hi").over(bw) <= F.col("_lo"), F.lit(True)),
    ).agg(F.min("_ok").alias("ranges_disjoint"))

    return within.crossJoin(disjoint).select(
        "n_rows", "within_sorted", "ranges_disjoint"
    )
