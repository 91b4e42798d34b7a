"""One-off probe: does max_list_size actually fix the skewed-build
straggler (the realistic 100 TB failure the salted tier exists for)?

Corpus: 60k x 32 vectors where HALF the rows sit in one tight cluster, so
one IVF list swallows ~50% of the corpus.  The unsalted build then runs
one sequential graph task of ~30k rows while 31 cores idle; the salted
build splits that list into ~cap-sized sub-builds that run in parallel.
Measures: build wall unsalted vs salted, the largest physical group size
either way, and full-probe recall@10 vs exact.  Recall (not strict
equality) because the corpus is deliberately duplicate-degenerate: the
diversity heuristic prunes near-clones out of each other's adjacency —
the REFERENCE's own behavior (selectNeighborsHeuristic keeps a candidate
only if no kept neighbor is more similar to it than the node,
src/main.ts:171-200, with no keepPrunedConnections fill) — so a few
orphaned clones per hot query are the algorithm's property, identical
under salting or not; the oracle full-probe rows stay exact on
non-degenerate fixtures.

Results are recorded into bench.py's `salted_skew_recorded` axis with
measured_on provenance (the per-round bench stays lean, like the XL
crossover one-offs).

Usage: python tools/salted_skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.session import get_spark

    spark = get_spark(
        app_name="salted_skew_probe", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, d, hot_frac, cap = 60_000, 32, 0.5, 4_000
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

    out: dict = {"n": n, "dim": d, "hot_fraction": hot_frac, "n_lists": 16,
                 "max_list_size": cap}
    for label, kwargs in (
        ("unsalted", {}),
        ("salted", {"max_list_size": cap}),
    ):
        t0 = time.time()
        idx = build_hnsw_index(
            emb, n_lists=16, m=8, ef_construction=32, max_level=0, **kwargs
        )
        idx.index_df = idx.index_df.cache()
        idx.index_df.count()
        wall = time.time() - t0
        key = "sub_id" if "sub_id" in idx.index_df.columns else "list_id"
        biggest = (
            idx.index_df.groupBy(key).count().agg(F.max("count")).first()[0]
        )
        out[label] = {
            "build_wall_s": round(wall, 2),
            "largest_group": int(biggest),
        }
        from hnsw_spark.operators.evaluation import mean_recall, recall_table

        qs = emb.filter(F.col("vec_id") % 7500 == 0)  # 8 queries, both modes
        got = idx.search(
            qs, k=10, n_probe=16, ef_search=1 << 20, dispatch="beam"
        )
        exact = knn_exact(emb, qs, k=10, metric="cosine")
        rec = mean_recall(recall_table(got, exact)).first().mean_recall
        out[label]["full_probe_recall_at_10"] = round(float(rec), 4)
        idx.index_df.unpersist()
    out["build_speedup_x"] = round(
        out["unsalted"]["build_wall_s"] / out["salted"]["build_wall_s"], 2
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
