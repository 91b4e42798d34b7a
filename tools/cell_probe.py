"""Isolated per-cell wall probe for optimization work: times each named
registered query against the noop sink (guide §1.4 — full materialization,
no sink cost) N times on a fresh session, with job descriptions so the work
is attributable, and prints one JSON line per cell.

Usage: python tools/cell_probe.py <sf_dir> [-n runs] [--explain DIR] query ...

``--explain DIR`` additionally writes each query's ``explain('formatted')``
to DIR/<query>.txt (the plans/r13 evidence files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    from hnsw_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="cell_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # Spawn+warm the Python workers before any timed cell: the first
    # mapInPandas stage in a fresh session pays ~10-20 s of concurrent
    # worker fork + pandas import, a per-SESSION cost the driver's bench
    # amortizes over 179 cells — without this, whichever query is probed
    # first absorbs it and the walls are not comparable to warm bench cells.
    import pandas as _pd

    spark.sparkContext.setJobDescription("warmup: python workers")
    spark.range(0, int(cpus) * 4, 1, int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)

    qs = entrymod.queries()
    for name in args.queries:
        fn = qs.get(name)
        if fn is None:
            print(json.dumps({"query": name, "err": "not registered"}))
            continue
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            try:
                df = fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(args.explain, f"{name}.txt"), "w"
                ) as f:
                    f.write(plan)
            except Exception as e:
                print(f"explain {name} failed: {e!r}", file=sys.stderr)
        walls = []
        err = None
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            try:
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:
                err = repr(e)[:300]
                break
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        # bench fidelity: the bench clears library-owned persists and the
        # catalog cache BETWEEN cells (never between a cell's samples) —
        # without this, a later query rides the previous query's caches
        # and probes read artificially low
        from hnsw_spark.plans.cachereg import release_caches

        release_caches()
        spark.catalog.clearCache()
        out = {"query": name, "walls": walls}
        if err:
            out["err"] = err
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
