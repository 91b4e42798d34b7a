"""One-off probe: the int8 HNSW store at the crossover scale point
(1M x 64 clustered, the hnsw_crossover axis corpus) — search wall,
recall@10 vs same-session exact, and the node-table parquet footprint
vs the float store.  Records the store ladder's 4x-compression claim for
the GRAPH tier at the scale where it matters (fixture cells are
overhead-dominated), same recorded-axis pattern as the XL crossovers.

Usage: python tools/int8_hnsw_xl.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from hnsw_spark.operators.evaluation import mean_recall, recall_table
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.session import get_spark
    from hnsw_spark.sources.synthetic import synthetic_vectors

    spark = get_spark(
        app_name="int8_hnsw_xl", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    n, d, q_n, n_lists = 1_000_000, 64, 512, 256
    big = (
        synthetic_vectors(spark, n, d, seed=17, distribution="clustered")
        .repartition(32)
        .cache()
    )
    big.count()
    xq = big.filter(F.col("vec_id") < q_n).cache()
    xq.count()
    exact_walls = []
    for _ in range(3):
        t0 = time.time()
        knn_exact(
            big, xq, k=10, metric="cosine", strategy="local_merge"
        ).write.format("noop").mode("overwrite").save()
        exact_walls.append(time.time() - t0)
    exact_df = knn_exact(
        big, xq, k=10, metric="cosine", strategy="local_merge"
    ).cache()
    exact_df.count()

    out = {"n": n, "dim": d, "n_queries": q_n, "n_lists": n_lists,
           "m": 16, "ef_construction": 96,
           "exact_wall_best_s": round(min(exact_walls), 3)}
    for store in ("float32", "int8"):
        t0 = time.time()
        idx = build_hnsw_index(
            big, n_lists=n_lists, m=16, ef_construction=96,
            metric="cosine", store=store,
        )
        tmp = os.path.join(".tmp", f"int8xl_{store}")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            idx.index_df.repartition(32, "list_id")
            .write.mode("overwrite").parquet(tmp)
        )
        build_s = time.time() - t0
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(tmp)
            for f in fs
        )
        idx.index_df = spark.read.parquet(tmp).cache()
        idx.index_df.count()
        walls = []
        for _ in range(3):
            t0 = time.time()
            idx.search(
                xq, k=10, n_probe=6, ef_search=96, dispatch="beam"
            ).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        rec = mean_recall(
            recall_table(
                idx.search(xq, k=10, n_probe=6, ef_search=96,
                           dispatch="beam"),
                exact_df,
            )
        ).first().mean_recall
        out[store] = {
            "build_wall_s": round(build_s, 1),
            "node_table_bytes": nbytes,
            "search_wall_best_s": round(min(walls), 3),
            "recall_at_10": round(float(rec), 4),
            "speedup_vs_exact": round(min(exact_walls) / min(walls), 2),
        }
        idx.index_df.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    out["compression_ratio"] = round(
        out["float32"]["node_table_bytes"] / out["int8"]["node_table_bytes"],
        2,
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
