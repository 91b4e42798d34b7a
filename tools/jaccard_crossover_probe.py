"""One-off probe: where does the PPJoin prefix plan overtake the brute
shingle equi-join for EXACT Jaccard self-join at t=0.8?

The fixture corpora cannot show this: their shingle document frequencies
are near-uniform and tiny, so the prefix pipeline's fixed shuffles lose to
brute force (measured in round 9: 2.1-2.3 s vs 1.8 s at sf0.1).  Nor can
independent-position zipf skew: a trigram's df is the PRODUCT of three
word probabilities, so even u^3-skewed words left brute ahead at 400k docs
(0.69x, first sweep of this probe).  What actually blows the brute join up
is BOILERPLATE — templated runs of words shared verbatim by thousands of
documents (license headers, scaffold HTML, form letters), which put the
same shingles in df=n/templates buckets and make the pair aggregation
carry sum-of-df^2 rows for pairs that share nothing but the template.

This probe generates that corpus: each doc = a 12-word template (one of
``n_templates``, by doc_id) + an 18-word unique hash tail; every same-
template pair shares ~10 shingles (far below t=0.8), and a planted 1-in-97
near-dup reuses the previous doc's tail (a real pair).  Three plans race:
brute equi-join (sum-of-df^2 explodes), the max_doc_freq CAPPED twin (fast
but value-changing — the documented approximation), and the PPJoin prefix
plan (fast AND exact: template shingles are high-df, so they never enter
the rarest-shingle prefix and template-only pairs are never generated).

Results get recorded into bench.py's `jaccard_crossover_recorded` axis
with provenance, completing the VERDICT r8 #5 story with a measured
crossover instead of a plan swap the fixtures would contradict.

Usage: python tools/jaccard_crossover_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def boilerplate_documents(spark, count: int, n_templates: int, seed: int):
    """Deterministic template corpus: 12 template words shared by all docs
    with the same doc_id % n_templates, then an 18-word unique hash tail;
    docs with doc_id % 97 == 0 reuse the PREVIOUS doc's tail (planted
    near-dups — Jaccard well above 0.8 since they differ only in nothing)."""
    from hnsw_spark.functions.hashing import h31

    base = spark.range(count).withColumnRenamed("id", "doc_id")
    is_dup = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") > 0)
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    tmpl_src = (src % n_templates).cast("string")
    tail_src = src.cast("string")

    def hword(tag, src, j):
        return F.concat(
            F.lit(tag),
            (h31(F.concat(F.lit(f"{tag}{seed}_"), src, F.lit("_"),
                          j.cast("string"))) % 100000).cast("string"),
        )

    tmpl = F.transform(
        F.sequence(F.lit(0), F.lit(11)), lambda j: hword("t", tmpl_src, j)
    )
    tail = F.transform(
        F.sequence(F.lit(0), F.lit(17)), lambda j: hword("u", tail_src, j)
    )
    return base.select(
        "doc_id",
        F.array_join(F.concat(tmpl, tail), " ").alias("text"),
    )


def main() -> None:
    from hnsw_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )
    from hnsw_spark.plans.cachereg import release_caches
    from hnsw_spark.session import get_spark

    spark = get_spark(
        app_name="jaccard_crossover", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = 0.8
    out = {"threshold": t, "n": 3, "n_templates": 50,
           "shape": "12-word template + 18-word unique tail, 1/97 near-dups",
           "points": []}
    capped = lambda d, n, threshold: ngram_jaccard_pairs(  # noqa: E731
        d, n=n, threshold=threshold, max_doc_freq=100
    )
    for n_docs in (20_000, 100_000):
        docs = boilerplate_documents(spark, n_docs, 50, seed=13).repartition(
            32
        ).cache()
        docs.count()
        point = {"n_docs": n_docs}
        # exactness: prefix == brute pair-for-pair (the capped twin is the
        # documented approximation and is NOT expected to match)
        a = {tuple(r) for r in jaccard_prefix_pairs(docs, n=3, threshold=t)
             .select("id_a", "id_b", "n_common").collect()}
        release_caches()
        b = {tuple(r) for r in ngram_jaccard_pairs(docs, n=3, threshold=t)
             .select("id_a", "id_b", "n_common").collect()}
        point["n_pairs"], point["prefix_exact"] = len(b), a == b
        for label, fn in (
            ("brute_wall_s", ngram_jaccard_pairs),
            ("capped_wall_s", capped),
            ("prefix_wall_s", jaccard_prefix_pairs),
        ):
            walls = []
            for _ in range(2):
                t0 = time.time()
                fn(docs, n=3, threshold=t).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls.append(time.time() - t0)
                release_caches()
            point[label] = round(min(walls), 2)
        point["prefix_speedup_x"] = round(
            point["brute_wall_s"] / point["prefix_wall_s"], 2
        )
        docs.unpersist()
        spark.catalog.clearCache()
        out["points"].append(point)
        print(json.dumps(point))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
