"""Fixture-schema drift gate.

The driver regenerates /root/testdata between rounds and has already shipped
the same column under two physical types (events.ts: TIMESTAMP(NANOS) in r2,
TIMESTAMP(MICROS) in r3) — the r3 flip silently broke 8 queries, 3 tests, and
the whole bench artifact before any named test caught it.  This test pins the
LOADER-NORMALIZED schema of every table: if the testdata drifts again, ONE
test fails with a message naming the table and column instead of a pile of
AnalysisExceptions downstream.
"""

from __future__ import annotations

import os

import pytest

from hnsw_spark.sources.tables import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"

# loader-normalized (post-load_table) schema, as (column, simpleString) pairs.
# events.ts is listed as timestamp_ntz because load_table normalizes BOTH
# accepted physical encodings (nanos-as-long, timestamp[us/ns]) to it.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp_ntz"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("table", TABLES)
def test_loader_normalized_schema(spark, table):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    df = load_table(spark, SF_DIR, table)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == EXPECTED[table], (
        f"fixture schema drift in {table!r}: loader-normalized schema "
        f"changed — update load_table (and this pin) deliberately.\n"
        f"  got:      {got}\n  expected: {EXPECTED[table]}"
    )


def test_events_physical_type_is_accepted():
    """The raw parquet physical type for events.ts must be one load_table
    handles: int64 (nanos-as-long epoch), or a timestamp unit.  A third
    encoding appearing here means the loader needs a new branch."""
    import pyarrow.parquet as pq

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")
    t = pq.read_schema(os.path.join(SF_DIR, "events.parquet")).field("ts").type
    assert str(t) in ("int64", "timestamp[ns]", "timestamp[us]", "timestamp[ms]"), (
        f"events.ts physical type {t} is not one load_table normalizes"
    )
