"""SCD2 as-of enrichment: batch semantics (boundary, pre-history, missing
key), the scd2_intervals operator extraction, and stream==batch parity of
the stream-static join on the events fixture."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import time

import pytest

from pyspark.sql import functions as F

from hnsw_spark.operators.temporal import scd2_intervals
from hnsw_spark.streaming.enrich import scd2_asof_enrich

_T0 = dt.datetime(2024, 1, 1)


def _ts(s: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=s)


def _dim(spark):
    # user u1: state A [0, 100), B [100, None); user u2: X [50, None)
    return spark.createDataFrame(
        [
            ("u1", "A", _ts(0), _ts(100)),
            ("u1", "B", _ts(100), None),
            ("u2", "X", _ts(50), None),
        ],
        "user_id string, state string, valid_from timestamp_ntz, "
        "valid_to timestamp_ntz",
    )


def test_asof_semantics_boundary_prehistory_missing_key(spark):
    events = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),   # inside [0,100) -> A
            (2, "u1", _ts(100)),  # boundary -> NEWER version B
            (3, "u1", _ts(500)),  # open current row -> B
            (4, "u2", _ts(10)),   # before u2's first interval -> NULL
            (5, "u3", _ts(10)),   # key absent from dim -> NULL
        ],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    out = {
        r.event_id: r.state
        for r in scd2_asof_enrich(events, _dim(spark)).collect()
    }
    assert out == {1: "A", 2: "B", 3: "B", 4: None, 5: None}


def test_payload_name_collision_gains_suffix(spark):
    events = spark.createDataFrame(
        [(1, "u1", _ts(10), "event_state")],
        "event_id long, user_id string, ts timestamp_ntz, state string",
    )
    out = scd2_asof_enrich(events, _dim(spark)).collect()[0]
    assert out.state == "event_state" and out.state_dim == "A"


def test_scd2_operator_intervals_partition_timeline(spark):
    ev = spark.createDataFrame(
        [
            ("u1", "A", _ts(0), 1),
            ("u1", "A", _ts(10), 2),
            ("u1", "B", _ts(20), 3),
            ("u1", "A", _ts(30), 4),
        ],
        "user_id string, event_type string, ts timestamp_ntz, event_id long",
    )
    rows = sorted(
        scd2_intervals(ev).collect(), key=lambda r: r.valid_from
    )
    assert [(r.state, r.n_events, r.is_current) for r in rows] == [
        ("A", 2, False),
        ("B", 1, False),
        ("A", 1, True),
    ]
    # intervals chain with no gaps: each valid_to == next valid_from
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].valid_to is None
    # round-trip: enriching the source events against their own dimension
    # recovers each event's own state (boundary events belong to the newer
    # version, which is the version the event itself opened)
    enriched = scd2_asof_enrich(
        ev.select("event_id", "user_id", "ts"), scd2_intervals(ev)
    )
    got = {r.event_id: r.state for r in enriched.collect()}
    assert got == {1: "A", 2: "A", 3: "B", 4: "A"}


def _land(spark, src_dir, name, df, mtime):
    tmp = os.path.join(src_dir + "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.makedirs(src_dir, exist_ok=True)
    dest = os.path.join(src_dir, f"{name}.parquet")
    shutil.move(part, dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


@pytest.mark.slow
def test_stream_enrich_matches_batch_on_fixture(spark, tmp_path):
    """Stream-static enrichment over micro-batches == the same batch join,
    on the real events fixture against its own SCD2 dimension."""
    from hnsw_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    dim = scd2_intervals(load_table(spark, sf_dir, "events")).localCheckpoint(
        eager=True
    )

    batch = {
        (r.event_id, r.state)
        for r in scd2_asof_enrich(ev, dim).collect()
    }

    src = str(tmp_path / "enrich_events")
    base = time.time() - 1000
    half = ev.filter(F.col("event_id") % 2 == 0)
    rest = ev.filter(F.col("event_id") % 2 == 1)
    _land(spark, src, "f1", half, base)
    _land(spark, src, "f2", rest, base + 10)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        scd2_asof_enrich(stream, dim)
        .select("event_id", "state")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.event_id, r.state)
            for r in spark.sql("select * from enriched").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0
