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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hnsw_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(spark_pd)} rows  ({t_spark:.1f}s)")
            continue
        try:
            oracle_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok, msg = compare(spark_pd, oracle_pd)
        status = "OK  " if ok else "FAIL"
        if not ok:
            n_fail += 1
        print(f"{status}  {name}: {len(spark_pd)} rows, {msg}  ({t_spark:.1f}s)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
