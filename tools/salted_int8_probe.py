"""One-off probe: the salted × int8 COMPOSITION at the scale point where
the two knobs would compose at 100 TB — a skew-clustered corpus (the
salted tier's reason to exist) whose node table is IO-bound (the int8
store's reason to exist).  Round 9 pinned each knob's full-probe
exactness alone; round 10's hnsw_salted_int8_full_probe pins the
composition's values; this probe records the composition's ECONOMICS:
build wall (does the salt still kill the hot-list straggler when the
store is int8?), node-table bytes (does the compression survive the
sub_id column and salted layout?), tuned-probe search wall, and
recall@10 vs the true float exact operator.

Corpus: the salted_skew_probe shape — 60k x 32 with HALF the corpus in
one tight cluster (one IVF list swallows ~50%), 512 queries so the
batched beam has something to amortize against.  Three arms:

- int8 UNSALTED: the straggler case with the compressed store,
- float32 SALTED: the round-9 recorded arm's shape (re-measured same-
  session for a fair build-wall comparison),
- int8 SALTED: the composition.

Results are recorded into bench.py's `salted_int8_recorded` axis with
measured_on provenance (the per-round bench stays lean, like the XL
crossover one-offs).

Usage: python tools/salted_int8_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from hnsw_spark.operators.evaluation import mean_recall, recall_table
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.session import get_spark

    spark = get_spark(
        app_name="salted_int8_probe", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, d, hot_frac, cap, n_q = 60_000, 32, 0.5, 4_000, 512
    rng = np.random.RandomState(7)
    hot_n = int(n * hot_frac)
    hot = rng.randn(hot_n, d) * 0.02 + rng.randn(1, d)  # one tight cluster
    rest = rng.randn(n - hot_n, d)
    mat = np.vstack([hot, rest]).astype(np.float32)
    pdf = [(i, mat[i].tolist()) for i in range(n)]
    emb = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>"
    ).repartition(32).cache()
    emb.count()
    qs = emb.filter(F.col("vec_id") % (n // n_q) == 0).cache()
    qs.count()
    exact = knn_exact(
        emb, qs, k=10, metric="cosine", strategy="local_merge"
    ).cache()
    exact.count()

    out: dict = {
        "n": n, "dim": d, "hot_fraction": hot_frac, "n_lists": 16,
        "max_list_size": cap, "n_queries": n_q, "m": 8,
        "ef_construction": 32, "search_knobs": {"n_probe": 8, "ef": 96},
    }
    for label, kwargs in (
        ("int8_unsalted", {"store": "int8"}),
        ("float32_salted", {"max_list_size": cap}),
        ("int8_salted", {"store": "int8", "max_list_size": cap}),
    ):
        t0 = time.time()
        idx = build_hnsw_index(
            emb, n_lists=16, m=8, ef_construction=32, max_level=0, **kwargs
        )
        idx.index_df = idx.index_df.cache()
        idx.index_df.count()
        build_wall = time.time() - t0
        key = "sub_id" if "sub_id" in idx.index_df.columns else "list_id"
        biggest = (
            idx.index_df.groupBy(key).count().agg(F.max("count")).first()[0]
        )
        tmp = os.path.join(".tmp", f"salted_int8_{label}")
        shutil.rmtree(tmp, ignore_errors=True)
        idx.index_df.write.mode("overwrite").parquet(tmp)
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(tmp)
            for f in fs
        )
        shutil.rmtree(tmp, ignore_errors=True)
        walls = []
        for _ in range(3):
            t0 = time.time()
            idx.search(
                qs, k=10, n_probe=8, ef_search=96, dispatch="beam"
            ).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        rec = mean_recall(
            recall_table(
                idx.search(qs, k=10, n_probe=8, ef_search=96,
                           dispatch="beam"),
                exact,
            )
        ).first().mean_recall
        out[label] = {
            "build_wall_s": round(build_wall, 2),
            "largest_group": int(biggest),
            "node_table_bytes": int(nbytes),
            "search_wall_best_s": round(min(walls), 3),
            "recall_at_10": round(float(rec), 4),
        }
        idx.index_df.unpersist()
    out["compression_ratio_salted"] = round(
        out["float32_salted"]["node_table_bytes"]
        / max(out["int8_salted"]["node_table_bytes"], 1),
        2,
    )
    out["salt_build_speedup_int8_x"] = round(
        out["int8_unsalted"]["build_wall_s"]
        / out["int8_salted"]["build_wall_s"],
        2,
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
