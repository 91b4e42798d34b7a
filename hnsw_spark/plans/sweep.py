"""Benchmark grid sweep (E6) + results sinks (K6/E9).

Parity target: the reference's sweep runner ``src/bench/run.ts:145-228`` —
nested parameter loops, per-cell index (re)build, brute-force ground truth,
per-cell recall@k and latency stats — and its sinks: timestamped results
JSON (``run.ts:230-238``) and the report CSV (``report.ts:185-240``).

Spark adaptation of the loop structure:
- build params (n_lists ↔ M's granularity role) rebuild the index; search
  params (n_probe, ef_search ↔ efSearch) re-query the same index — the
  reference reuses the index across its efSearch loop (run.ts:188, P7).
- ground truth is computed ONCE per corpus×metric and cached (run.ts:178-186
  computes it once per build cell; ours hoists it further since the exact
  answer doesn't depend on build params at all).
- latency is batch wall-clock / n_queries: Spark amortizes a query batch in
  one job, so per-query percentile spread is not observable the way a
  single-threaded per-call loop makes it; we record avg over the batch and
  note count.  recallAtK uses the same micro-average as the reference
  (Σhits/Σtotal, src/bench/metrics.ts:70-75).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from itertools import product
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from hnsw_spark.operators.evaluation import mean_recall, recall_table
from hnsw_spark.operators.knn import knn_exact

RESULT_COLUMNS = [
    "tier", "metric", "n_lists", "n_probe", "ef_search", "k",
    "n_base", "n_queries", "build_ms", "search_ms_total", "search_ms_avg",
    "recall_at_k",
]


@dataclass
class SweepConfig:
    """The parameter grid (reference defaults: run.ts:85-90 scaled to the
    IVF/HNSW knobs)."""

    tiers: Sequence[str] = ("ivf",)  # 'ivf' | 'hnsw'
    n_lists: Sequence[int] = (8, 16)
    n_probe: Sequence[int] = (1, 2, 4)
    ef_search: Sequence[int] = (50,)  # hnsw-only knob
    k: int = 10
    metric: str = "cosine"
    m: int = 8
    ef_construction: int = 64
    seed: int = 42
    extra: dict = field(default_factory=dict)


def run_sweep(
    spark: SparkSession,
    base: DataFrame,
    queries: DataFrame,
    config: SweepConfig | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict]:
    """Run the grid; one result row per (tier, n_lists, n_probe[, ef_search])
    cell, the reference's RunResult shape (run.ts:29-53)."""
    from hnsw_spark.operators.ann import build_ivf_index
    from hnsw_spark.operators.hnsw_graph import build_hnsw_index

    cfg = config or SweepConfig()
    n_base = base.count()
    n_queries = queries.count()

    # ground truth once (P7 reuse, hoisted): exact doesn't depend on build
    exact = knn_exact(
        base, queries, k=cfg.k, metric=cfg.metric,
        base_id=id_col, base_vec=vec_col, query_id=id_col, query_vec=vec_col,
    ).cache()
    exact.count()

    results: list[dict] = []
    for tier, nl in product(cfg.tiers, cfg.n_lists):
        t0 = time.time()
        if tier == "hnsw":
            index = build_hnsw_index(
                base, n_lists=nl, m=cfg.m, ef_construction=cfg.ef_construction,
                metric=cfg.metric, id_col=id_col, vec_col=vec_col, seed=cfg.seed,
            )
        elif tier == "ivf":
            index = build_ivf_index(
                base, n_lists=nl, metric=cfg.metric,
                id_col=id_col, vec_col=vec_col, seed=cfg.seed,
            )
        else:
            raise ValueError(f"unknown tier: {tier!r}")
        # materialize the index once so search cells don't re-pay the build
        # (the reference reuses the index across its efSearch loop, run.ts:188)
        index.index_df = index.index_df.cache()
        index.index_df.count()
        build_ms = (time.time() - t0) * 1000.0

        ef_grid = cfg.ef_search if tier == "hnsw" else (None,)
        for n_probe, ef in product(cfg.n_probe, ef_grid):
            if n_probe > nl:
                continue
            t1 = time.time()
            kwargs = {"ef_search": ef} if ef is not None else {}
            if tier == "hnsw":
                # the sweep measures the BEAM at these knobs; auto dispatch
                # would route fixture-scale batches to exact and flatten
                # every recall/latency curve the sweep exists to trace
                kwargs["dispatch"] = "beam"
            approx = index.search(
                queries, k=cfg.k, n_probe=n_probe,
                query_id=id_col, query_vec=vec_col, **kwargs,
            )
            approx.write.format("noop").mode("overwrite").save()
            search_ms = (time.time() - t1) * 1000.0
            rec = (
                mean_recall(recall_table(approx, exact)).first().mean_recall
            )
            results.append(
                {
                    "tier": tier,
                    "metric": cfg.metric,
                    "n_lists": nl,
                    "n_probe": n_probe,
                    "ef_search": ef,
                    "k": cfg.k,
                    "n_base": n_base,
                    "n_queries": n_queries,
                    "build_ms": round(build_ms, 1),
                    "search_ms_total": round(search_ms, 1),
                    "search_ms_avg": round(search_ms / max(n_queries, 1), 3),
                    "recall_at_k": round(float(rec), 4),
                }
            )
        index.index_df.unpersist()
    exact.unpersist()
    return results


def write_results_json(results: list[dict], config: dict, path: str) -> str:
    """K6 sink: one JSON document {config, results} (run.ts:230-238)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"config": config, "results": results}, f, indent=2)
    return path


def results_to_df(spark: SparkSession, results: list[dict]) -> DataFrame:
    schema = (
        "tier string, metric string, n_lists int, n_probe int, ef_search int, "
        "k int, n_base long, n_queries long, build_ms double, "
        "search_ms_total double, search_ms_avg double, recall_at_k double"
    )
    rows = [tuple(r[c] for c in RESULT_COLUMNS) for r in results]
    return spark.createDataFrame(rows, schema)


def write_results_csv(spark: SparkSession, results: list[dict], path: str) -> None:
    """E9 sink: header CSV via the DataFrame writer."""
    results_to_df(spark, results).coalesce(1).write.mode("overwrite").csv(
        path, header=True
    )
