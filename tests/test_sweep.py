"""Grid sweep runner (E6) + sinks (K6/E9): cell coverage, qualitative
recall curve (n_probe↑ → recall↑, the reference's documented expectation,
bench/README.md:102-104), and sink round-trips."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from hnsw_spark.plans.sweep import (
    SweepConfig,
    run_sweep,
    results_to_df,
    write_results_csv,
    write_results_json,
)
from hnsw_spark.sources.synthetic import synthetic_vectors


def test_sweep_grid_and_recall_curve(spark, tmp_path):
    base = synthetic_vectors(spark, 1000, 8, seed=11).cache()
    queries = base.filter(F.col("vec_id") < 10)
    cfg = SweepConfig(tiers=("ivf",), n_lists=(4,), n_probe=(1, 4), k=5)
    results = run_sweep(spark, base, queries, cfg)
    assert len(results) == 2  # one row per grid cell
    by_probe = {r["n_probe"]: r for r in results}
    # full probe degenerates to exact → recall 1.0; monotone in n_probe
    assert by_probe[4]["recall_at_k"] == 1.0
    assert by_probe[4]["recall_at_k"] >= by_probe[1]["recall_at_k"]
    assert all(r["build_ms"] > 0 and r["search_ms_total"] > 0 for r in results)

    # K6 JSON sink round-trip
    out = write_results_json(results, {"k": 5}, str(tmp_path / "res.json"))
    with open(out) as f:
        doc = json.load(f)
    assert doc["config"] == {"k": 5} and len(doc["results"]) == 2

    # E9 CSV sink: header + one line per cell
    write_results_csv(spark, results, str(tmp_path / "res_csv"))
    back = spark.read.csv(str(tmp_path / "res_csv"), header=True)
    assert back.count() == 2
    assert "recall_at_k" in back.columns


def test_sweep_hnsw_tier(spark):
    base = synthetic_vectors(spark, 400, 8, seed=3).cache()
    queries = base.filter(F.col("vec_id") < 5)
    cfg = SweepConfig(
        tiers=("hnsw",), n_lists=(2,), n_probe=(2,), ef_search=(32,),
        k=5, m=8, ef_construction=32,
    )
    results = run_sweep(spark, base, queries, cfg)
    assert len(results) == 1
    # both lists probed + wide beam → near-exact
    assert results[0]["recall_at_k"] >= 0.9
    df = results_to_df(spark, results)
    assert df.count() == 1 and df.first().tier == "hnsw"
