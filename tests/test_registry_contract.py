"""Driver-contract meta-tests over the whole registry: the classes of
silent failure the per-query oracles can't see.

- the hash harness sorts columns by name and hashes scalars — an
  array/map/struct output column would break comparison for that query, so
  no registered query may emit one;
- duplicate or empty output column names make the sorted-column hash
  ambiguous;
- every name in the rotation lists must resolve to a registered query (a
  typo would silently drop a query from the driver's evidence window);
- every oracle belongs to a registered query.

Schema-only: plans are analyzed, nothing executes, so sweeping all ~130
queries stays cheap.
"""

from __future__ import annotations

import pytest

from hnsw_spark import registry
from hnsw_spark.registry import QUERIES, ORACLES, _RUN_FIRST, _RUN_LAST

registry.load_all_queries()

SF = "/root/testdata/sf0.001"

_COMPLEX = ("array", "map", "struct")


def test_registry_is_complete_and_loads_loudly():
    # load_all_queries re-raises import errors (no silent shrinking —
    # VERDICT r6 #2); the pinned counts make ANY accidental drop fail the
    # suite instead of quietly narrowing the driver's evidence window.
    # Update both pins when registering new queries.
    assert len(QUERIES) == 223, sorted(QUERIES)
    assert len(ORACLES) == 221


def test_rotation_lists_name_only_registered_queries():
    missing_first = [n for n in _RUN_FIRST if n not in QUERIES]
    missing_last = [n for n in _RUN_LAST if n not in QUERIES]
    assert missing_first == [] and missing_last == []


def test_every_oracle_has_a_query():
    assert [n for n in ORACLES if n not in QUERIES] == []


def test_run_first_fills_but_does_not_overflow_driver_window():
    # the driver records the first 50 registered queries; _RUN_FIRST's
    # in-window prefix is the evidence policy, so it must cover the window
    assert len([n for n in _RUN_FIRST if n in QUERIES]) >= 50


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_hashable(spark, name):
    df = QUERIES[name](spark, SF)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
    assert all(c.strip() for c in cols), f"{name}: empty column name"
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(_COMPLEX), (
            f"{name}.{f.name} is {t}: the driver's value hash cannot sort "
            "array/map/struct columns - scalarize it"
        )


def test_every_oracle_parses_and_plans_in_duckdb():
    """EXPLAIN every oracle against the sf0.001 views: catches dialect
    typos and schema drift in oracles that a given round's builder-side
    replay might not have exercised.  Planning only — nothing executes."""
    import duckdb

    from hnsw_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = {}
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad[name] = repr(e)[:120]
    assert bad == {}


def test_committed_bench_sidecar_is_healthy():
    """The committed BENCH_PROTOCOL.json must never regress to the
    BENCH_r03 failure mode: it needs real cells, no per-cell errors, a
    populated calibration block, and recall knees at or above the
    registered floor."""
    import json

    with open("/root/repo/BENCH_PROTOCOL.json") as f:
        d = json.load(f)
    line = d["line"]
    # Compact-line layout (round 5): the headline line carries only the
    # baseline-shared cells; the full per-query map lives in queries_all.
    assert line["n_queries"] >= 80
    assert len(d["queries_all"]) >= 80
    assert not line.get("errors")
    assert isinstance(line["calib"], dict) and "matmul_1024_ms" in line["calib"]
    from hnsw_spark.queries.index import ANN_RECALL_FLOOR

    for tier, r in line["recall10"].items():
        assert r is not None and r >= ANN_RECALL_FLOOR, tier
