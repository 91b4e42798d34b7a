"""One-off XL ANN-crossover measurement (VERDICT r6 #8 stretch axis).

Extends the per-round `ann_crossover` protocol cell (bench.py) one axis
point further: 16M x 64 clustered float32 (the largest corpus that fits
this 128 GiB box comfortably), exact BLAS local_merge vs probe-pruned IVF
at the same recall protocol.  Run manually on an otherwise-idle machine;
the result is recorded (with host calibration) in BENCH_PROTOCOL notes /
README rather than re-measured per round — a 16M build costs minutes and
would dominate the driver's bench budget.

Usage: python tools/crossover_xl.py [n_base] [n_lists] [n_probe]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_probe = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_q = 64

    from pyspark.sql import functions as F

    from hnsw_spark.operators.ann import build_ivf_index
    from hnsw_spark.operators.evaluation import mean_recall, recall_table
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.session import get_spark
    from hnsw_spark.sources.synthetic import synthetic_vectors

    spark = get_spark(app_name="crossover_xl",
                      extra_conf={"spark.driver.memory": "48g"})

    t0 = time.time()
    big = (
        synthetic_vectors(spark, n, 64, seed=17, distribution="clustered")
        .repartition(64)
        .persist()
    )
    big.count()
    gen_s = time.time() - t0
    xq = big.filter(F.col("vec_id") < n_q).cache()
    xq.count()

    exact_walls = []
    for _ in range(3):
        t0 = time.time()
        knn_exact(
            big, xq, k=10, metric="cosine", strategy="local_merge"
        ).write.format("noop").mode("overwrite").save()
        exact_walls.append(time.time() - t0)

    t0 = time.time()
    idx = build_ivf_index(big, n_lists=n_lists, metric="cosine")
    idx.index_df = (
        idx.index_df.repartition(64, "list_id")
        .sortWithinPartitions("list_id")
        .persist()
    )
    idx.index_df.count()
    build_s = time.time() - t0

    ivf_walls = []
    for _ in range(3):
        t0 = time.time()
        idx.search(xq, k=10, n_probe=n_probe).write.format("noop").mode(
            "overwrite"
        ).save()
        ivf_walls.append(time.time() - t0)

    exact_df = knn_exact(big, xq, k=10, metric="cosine",
                         strategy="local_merge")
    rec = mean_recall(
        recall_table(idx.search(xq, k=10, n_probe=n_probe), exact_df)
    ).collect()[0]["mean_recall"]

    # host calibration so the number is comparable across rounds
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1024, 1024))
    t0 = time.time()
    a @ a
    matmul_ms = (time.time() - t0) * 1000

    out = {
        "n_base": n,
        "dim": 64,
        "distribution": "clustered",
        "n_lists": n_lists,
        "n_probe": n_probe,
        "n_queries": n_q,
        "gen_wall_s": round(gen_s, 1),
        "build_wall_s": round(build_s, 1),
        "exact_wall_best_s": round(min(exact_walls), 3),
        "ivf_wall_best_s": round(min(ivf_walls), 3),
        "speedup_vs_exact": round(min(exact_walls) / min(ivf_walls), 2),
        "recall_at_10": round(float(rec), 4),
        "calib_matmul_1024_ms": round(matmul_ms, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
