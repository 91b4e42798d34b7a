"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row count, column names/dtypes, and values
(order-insensitive: columns sorted by name, rows sorted by all columns).
Reports exact-equality and 1e-9-tolerance verdicts per query so float
mismatches surface before the driver sees them.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_spark.plans.cachereg import release_caches  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize ints/floats for cross-engine dtype parity
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pd) != len(oracle_pd):
        return False, f"rowcount {len(spark_pd)} != {len(oracle_pd)}"
    s, o = normalize(spark_pd), normalize(oracle_pd)
    if list(s.columns) != list(o.columns):
        return False, f"columns {list(s.columns)} != {list(o.columns)}"
    exact = True
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv):
            a, b = sv.to_numpy(), ov.to_numpy(float)
            same = np.array_equal(a, b, equal_nan=True)
            if not same:
                close = np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True)
                if not close:
                    i = int(np.argmax(~np.isclose(a, b, rtol=0, atol=1e-9, equal_nan=True)))
                    return False, f"col {c} differs beyond 1e-9 at row {i}: {a[i]!r} vs {b[i]!r}"
                exact = False
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                i = int((sv.astype(str) != ov.astype(str)).idxmax())
                return False, f"col {c} differs at row {i}: {sv[i]!r} vs {ov[i]!r}"
    return True, "exact" if exact else "close-not-exact (WOULD FAIL a bit-hash)"


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from hnsw_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    # the DRIVER's session does not enable Arrow, and with Arrow off
    # createDataFrame type-checks strictly (numpy scalars in arrays are
    # rejected — the r6 ann_binary_* crash).  Run the local gate in the
    # driver's configuration so builder-side replays cannot diverge from
    # the driver again.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # isolate queries: a query's internal persist()s must not ride into
        # the next cell's memory budget or timing (~200 queries share one
        # session here).  release_caches() pops the library-owned handles
        # (scoped cleanup, VERDICT r7 #6); the global clearCache keeps
        # belt-and-braces parity with the driver's fresh-session behavior.
        release_caches()
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            records[name] = {"status": "FAIL", "rows": None, "detail": "spark raised"}
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_pd)} rows  ({t_spark:.1f}s)")
            records[name] = {
                "status": "rows_only",
                "rows": len(spark_pd),
                "detail": "rows-only",
                "spark_s": round(t_spark, 1),
            }
            continue
        try:
            oracle_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            records[name] = {"status": "FAIL", "rows": len(spark_pd), "detail": "oracle raised"}
            n_fail += 1
            continue
        ok, msg = compare(spark_pd, oracle_pd)
        status = "OK  " if ok else "FAIL"
        if not ok:
            n_fail += 1
        records[name] = {
            "status": "OK" if ok else "FAIL",
            "rows": len(spark_pd),
            "detail": msg,
            "spark_s": round(t_spark, 1),
        }
        print(f"{status}  {name}: {len(spark_pd)} rows, {msg}  ({t_spark:.1f}s)")
    spark.stop()
    if json_out:
        # the ORACLE_FULL_r{N} artifact block for this sf_dir; the round
        # runner merges the sf0.01 and sf0.1 blocks (see ORACLE_FULL_r05)
        import datetime
        import json as _json

        block = {
            "sf_dir": sf_dir,
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ"),
            "tool": "tools/check_oracle.py (local replica of the driver correctness gate)",
            "n_queries": len(records),
            "n_exact": sum(
                1 for v in records.values() if v.get("detail") == "exact"
            ),
            "n_fail": n_fail,
            "n_rows_only": sum(
                1 for v in records.values() if v["status"] == "rows_only"
            ),
            "queries": records,
        }
        with open(json_out, "w") as f:
            _json.dump(block, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
