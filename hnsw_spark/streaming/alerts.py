"""Hysteresis threshold alerting: open when the value crosses ``high``,
close only when it falls back below ``low`` — the two-threshold state
machine every monitoring stack uses to stop alert flapping (a single
threshold re-fires on every oscillation around it).

Two implementations with identical semantics:

- ``threshold_alerts`` (batch): the state machine unrolled as window
  functions — a crossing marker (1 at ≥ high, 0 at ≤ low, NULL between),
  carried forward with ``last(ignorenulls)`` (gaps-and-islands), episodes
  numbered by a running count of 0→1 transitions.  One shuffle on the key;
  SQL-expressible, so it anchors the DuckDB oracle.
- ``stream_threshold_alerts``: the same machine as per-key GroupState over
  ``applyInPandasWithState`` — O(1) state per key (open flag, start, count,
  peak, episode counter), alerts straddle micro-batch boundaries, closed
  alerts emit as they close.  This is the form the batch windows CANNOT
  express incrementally: the carry-forward depends on every prior row.

Ordering contract (both forms): rows are processed in (ts, event_id)
order per key; the streaming form sorts within each micro-batch and
requires batches to arrive in non-decreasing time order per key (replayed
logs / ordered file sources), same as sessionize.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

ALERT_OUTPUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("episode", IntegerType()),
        StructField("alert_start", TimestampNTZType()),
        StructField("alert_end", TimestampNTZType()),
        StructField("n_events", LongType()),
        StructField("peak_value", DoubleType()),
    ]
)

# (open_flag, episode_counter, start_us, n, peak)
ALERT_STATE = StructType(
    [
        StructField("open", IntegerType()),
        StructField("episode", IntegerType()),
        StructField("start_us", LongType()),
        StructField("n", LongType()),
        StructField("peak", DoubleType()),
    ]
)


def threshold_alerts(
    events: DataFrame,
    high: float,
    low: float,
    by: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch alert episodes: DataFrame[(by, episode, alert_start,
    alert_end, n_events, peak_value)]; a still-open tail episode has
    alert_end NULL.  ``n_events``/``peak_value`` cover the rows WHILE the
    alert is open (the closing below-``low`` row is excluded)."""
    order = Window.partitionBy(by).orderBy(ts_col, id_col)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value_col)
    marker = F.when(v >= high, F.lit(1)).when(v <= low, F.lit(0))
    base = (
        events.withColumn("_m", marker)
        .withColumn(
            "_state", F.coalesce(F.last("_m", ignorenulls=True).over(run), F.lit(0))
        )
        .withColumn("_prev", F.lag("_state", 1, 0).over(order))
        .withColumn(
            "_ep",
            F.sum(
                ((F.col("_state") == 1) & (F.col("_prev") == 0)).cast("int")
            ).over(run),
        )
        .filter(
            (F.col("_state") == 1)
            | ((F.col("_state") == 0) & (F.col("_prev") == 1))
        )
    )
    in_alert = F.col("_state") == 1
    return base.groupBy(by, F.col("_ep").cast("int").alias("episode")).agg(
        F.min(F.when(in_alert, F.col(ts_col))).alias("alert_start"),
        F.min(F.when(~in_alert, F.col(ts_col))).alias("alert_end"),
        F.sum(in_alert.cast("long")).alias("n_events"),
        # raw exact max (it's one of the input doubles, no arithmetic):
        # quantization for oracle comparison is the query wrapper's job,
        # and rounding here risked a batch/stream parity gap (F.round is
        # HALF_UP, Python round() half-to-even)
        F.max(F.when(in_alert, v)).alias("peak_value"),
    )


def _alert_fn(high: float, low: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"], ignore_index=True)
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = batch["value"].to_numpy()

        if state.exists:
            is_open, episode, start, n, peak = state.get
        else:
            is_open, episode, start, n, peak = 0, 0, 0, 0, 0.0

        closed: list[tuple] = []
        for t, v in zip(ts_us, vals):
            if not is_open:
                if v >= high:
                    is_open, episode = 1, episode + 1
                    start, n, peak = int(t), 1, float(v)
            elif v <= low:
                closed.append((episode, start, int(t), n, peak))
                is_open = 0
            else:
                n, peak = n + 1, max(peak, float(v))
        state.update((is_open, episode, start, n, peak))

        if closed:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(closed),
                    "episode": [c[0] for c in closed],
                    "alert_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "alert_end": pd.to_datetime(
                        [c[2] for c in closed], unit="us"
                    ),
                    "n_events": [c[3] for c in closed],
                    "peak_value": [c[4] for c in closed],
                }
            )

    return fn


def stream_threshold_alerts(
    events: DataFrame, high: float, low: float
) -> DataFrame:
    """Streaming form over (event_type, event_id, ts, value): emits one row
    per CLOSED alert episode; an open episode survives in GroupState across
    micro-batches until a below-``low`` value closes it."""
    return (
        events.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _alert_fn(high, low),
            outputStructType=ALERT_OUTPUT,
            stateStructType=ALERT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
