"""Stream-static SCD2 as-of enrichment: join each event to the dimension
VERSION that was valid at the event's own timestamp.

This is the serving side of the type-2 slowly-changing dimension built by
``operators/temporal.py::scd2_intervals``: an event at time t must see the
attribute row whose validity interval contains t — not the current row
(that leaks the future into training features) and not a plain key join
(ambiguous when the dimension has history).

Scale design: in Structured Streaming a stream-static join is STATELESS —
no watermark, no state store; the static dimension is simply joined into
every micro-batch, and a dimension table is small relative to its fact
stream by construction, so the static side is broadcast and the plan is
shuffle-free on the event side.  The join is an equi-join on the key with
the interval containment ``valid_from <= ts AND (valid_to IS NULL OR
ts < valid_to)`` as a residual predicate — at most ONE dimension version
can match per event because SCD2 intervals partition the key's timeline,
so no post-join dedup is needed.  Exactly the same plan executes on a
batch frame, which is what the stream==batch parity tests pin.

No reference counterpart (the reference has no temporal dimension notion);
the operator exists because a 100 TB training pipeline re-materializes
features against dimension history constantly, and getting "as of event
time" wrong is a silent label-leakage bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_asof_enrich(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload_cols: list[str] | None = None,
    suffix: str = "_dim",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Each event row gains the dimension payload of the version valid at
    its timestamp; events before the key's first interval (or with a key
    absent from the dimension) keep NULL payload (left join).

    Interval convention: ``[valid_from, valid_to)`` — an event stamped
    exactly at a version boundary belongs to the NEWER version, and the
    open current row has ``valid_to`` NULL.  ``payload_cols`` defaults to
    every dimension column except the key and the two interval bounds;
    payload names colliding with event columns gain ``suffix``.

    ``events`` may be a streaming OR a batch DataFrame — the plan is
    identical (stream-static joins are stateless), which is what the
    parity tests in tests/test_streaming_enrich.py assert.

    Dimension refresh caveat: in a long-running stream, how fresh the
    joined dimension is depends on the static side's source.  A parquet
    static side re-lists files each micro-batch UNLESS it was persisted/cached
    (then it is frozen at first materialization); a localCheckpoint'ed or
    createDataFrame'd dim is frozen by construction.  To serve a dimension
    that itself changes mid-stream, rebuild it inside ``foreachBatch`` (or
    restart the query on a schedule) — SCD2 appends only, so a stale dim
    yields the older version, never a wrong one, for already-closed
    intervals.
    """
    payload_cols = payload_cols or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    overlap = set(events.columns) & set(payload_cols)
    d = dim.select(
        F.col(key).alias("_dk"),
        F.col(valid_from).alias("_vf"),
        F.col(valid_to).alias("_vt"),
        *[
            F.col(c).alias(f"{c}{suffix}" if c in overlap else c)
            for c in payload_cols
        ],
    )
    if broadcast_dim:
        d = F.broadcast(d)
    cond = (
        (events[key] == d["_dk"])
        & (d["_vf"] <= events[ts_col])
        & (d["_vt"].isNull() | (events[ts_col] < d["_vt"]))
    )
    return events.join(d, cond, "left").drop("_dk", "_vf", "_vt")
