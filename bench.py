"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced with the noop sink (full materialization — a bare
count() would let Catalyst prune computed columns and under-report).
Protocol axes follow BASELINE.md: exact kNN, ANN tier (build+search),
relational/evaluation queries, and the dedup ladder.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "knn_exact_cosine",
    "knn_exact_euclidean",
    "knn_topk_local_merge",
    "ann_ivf_knn",
    "ann_hnsw_knn",
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "events_hourly_rollup",
    "latency_summary",
    "recall_at_k",
    "dedup_exact",
    "text_quality",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_fingerprints",
    "embedding_neardup",
    "synthetic_vectors",
    "level_histogram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from hnsw_spark.session import get_spark

    spark = get_spark(
        app_name="hnsw_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm up the JVM, Python workers, and Arrow serde on the smallest
    # fixture so measurements reflect steady state, not first-call JIT
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for warm_q in ("tpch_q1_pricing_summary", "ann_hnsw_knn"):
        if warm_q in qs:
            qs[warm_q](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
