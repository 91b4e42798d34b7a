"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the Structured Streaming feature the built-in
windowed aggregates can't express (a session window's end depends on the
data, not the clock grid).

Semantics (shared with the batch ``user_sessions`` query, which closes a
session after ``gap`` seconds of inactivity): per user, events accumulate
into an open session held in GroupState; an event arriving more than
``gap`` seconds after the previous one CLOSES the open session (emitting
one row) and starts a new one.  Open sessions stay in state across
micro-batches — the streaming property batch jobs lack — and close either
on a later event or, in production, on event-time timeout against the
watermark.

Scale shape: state is partitioned by the grouping key across executors
(state store per shuffle partition), each group's state is O(1) (five
scalars — never the event list), and each micro-batch shuffles only that
batch's rows.  This is the standard Spark pattern for custom stateful
operators; checkpointing gives exactly-once state recovery.

Ordering contract: events for a user must be non-decreasing in time across
micro-batches (true for replayed logs and file sources named in order);
out-of-order *within* a batch is handled by sorting the batch.  A
watermark + EventTimeTimeout variant would also bound droppable lateness —
kept out of the core operator so the gap semantics stay oracle-comparable
with the batch query.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# (start_epoch_us, last_epoch_us, n_events, total_value)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_fn(gap_seconds: float):
    gap_us = int(gap_seconds * 1_000_000)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values("ts", ignore_index=True)
        # normalize to epoch µs regardless of pandas ns/us datetime unit
        ts_us = (
            batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        vals = batch["value"].to_numpy()

        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0

        closed: list[tuple] = []
        for t, v in zip(ts_us, vals):
            if start is None:
                start, last, n, total = int(t), int(t), 1, float(v)
            elif t - last > gap_us:
                closed.append((start, last, n, total))
                start, last, n, total = int(t), int(t), 1, float(v)
            else:
                last, n, total = int(t), n + 1, total + float(v)
        state.update((start, last, n, total))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                    "total_value": [round(c[3], 6) for c in closed],
                }
            )

    return fn


def stream_sessionize(
    events: DataFrame, gap_seconds: float = 1800.0
) -> DataFrame:
    """Gap-based sessionization over a (streaming or batch) events frame
    with columns (user_id, ts, value): emits one row per CLOSED session.
    The open tail session per user stays in GroupState awaiting more data."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
