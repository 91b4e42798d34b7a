"""Streaming trending top-N: "what's hot right now", continuously.

The missing piece between a windowed count and a dashboard is the RANK —
and ranking functions are not allowed inside an append-mode streaming
query (a row's rank isn't final until its whole window is).  The standard
Spark pattern, encoded here: keep the streaming side a plain watermarked
windowed aggregation (incremental state, bounded by the watermark), and
apply the rank in ``foreachBatch`` — each micro-batch hands the driver the
UPDATED aggregate table (complete output mode), which is dashboard-sized
(windows × keys), so a batch window-rank over it is trivial.

Scale note: complete mode re-emits the whole aggregate each trigger, which
is exactly right when the aggregate is small (trending tables are) and
exactly wrong when it isn't — for an unbounded key space, switch the sink
side to update mode + an idempotent upsert keyed on (window, key).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hnsw_spark.streaming.ingest import windowed_event_counts


def rank_trending(counts: DataFrame, top_n: int = 3) -> DataFrame:
    """Batch rank over a (win_start, win_end, event_type, n, ...) count
    table: top ``top_n`` keys per window, ties to the smaller key."""
    w = Window.partitionBy("win_start", "win_end").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("win_start", "win_end", "rank", "event_type", "n")
    )


def start_trending_query(
    events: DataFrame,
    table_name: str = "trending",
    window: str = "1 hour",
    slide: str | None = None,
    top_n: int = 3,
    watermark: str = "2 hours",
    on_batch: Callable[[DataFrame, int], None] | None = None,
):
    """Start the continuous trending query over a streaming events frame:
    watermarked sliding counts → complete-mode foreachBatch → ranked top-N
    registered as the global temp-ish view ``table_name`` every trigger
    (or handed to ``on_batch`` for a custom sink).  Returns the
    StreamingQuery handle."""
    counts = windowed_event_counts(events, window, slide, watermark)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = rank_trending(batch_df, top_n)
        if on_batch is not None:
            on_batch(ranked, epoch_id)
        else:
            ranked.createOrReplaceTempView(table_name)

    return (
        counts.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .start()
    )
