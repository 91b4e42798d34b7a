"""Simulate the DRIVER's correctness gate as exactly as possible: a plain
``SparkSession.builder`` session (no UTC pin, no Arrow, default AQE — the
consumer-default environment), the first-``window`` registry entries (the
driver's sample), and the same DuckDB comparator as tools/check_oracle.

This is the belt to check_oracle's braces: check_oracle runs the engine's
own session (Arrow forced off since round 7), while this harness runs the
stock builder session so ANY session-config divergence — not just the Arrow
one that bit round 6 — surfaces before the driver sees it.

Usage: python tools/driver_sim.py [sf_dir] [window]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_spark.plans.cachereg import release_caches  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    from tools.check_oracle import TABLES, compare

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = list(qs)[:window]
    n_bad = 0
    for name in names:
        release_caches()
        spark.catalog.clearCache()
        try:
            spark_pd = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"ROWS  {name}: {len(spark_pd)} rows (rows-only)")
                continue
            oracle_pd = con.execute(oracles[name]).df()
            ok, why = compare(spark_pd, oracle_pd)
            if ok is False:
                n_bad += 1
                print(f"FAIL  {name}: {why}")
            else:
                print(f"OK    {name}: {len(spark_pd)} rows")
        except Exception:
            n_bad += 1
            print(f"ERR   {name}:\n{traceback.format_exc()[-600:]}")
    print(f"window done: {len(names) - n_bad}/{len(names)} ok")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
