"""HNSW level sampling (B1) — the geometric layer distribution.

Parity target: reference ``src/main.ts:47-69``:
``probs[l] = e^(−l/mult) · (1 − e^(−1/mult))`` with ``mult = 1/ln(M)``,
truncated when < 1e-9; ``selectLevel`` walks the cumulative distribution with
one uniform draw (falling through to the last level).

The Spark twist: per-row randomness must be partition-invariant or results
change under repartitioning (``F.rand(seed)`` does NOT survive that).  The
uniform draw is therefore a deterministic md5 hash of (seed, id) — same value
on any cluster layout and expressible identically in DuckDB, so the whole
level assignment is oracle-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hnsw_spark.functions.hashing import P31, h31, h31_sql


def level_probs(m: int) -> list[float]:
    """Geometric level probabilities (reference src/main.ts:47-57)."""
    mult = 1.0 / math.log(m)
    probs, level = [], 0
    while True:
        p = math.exp(-level / mult) * (1 - math.exp(-1 / mult))
        if p < 1e-9:
            break
        probs.append(p)
        level += 1
    return probs


def uniform_from_id(id_col: Column | str, seed: int = 42) -> Column:
    """Deterministic pseudo-uniform in [0,1) from (seed, id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return h31(F.concat(F.lit(f"lvl{seed}_"), c.cast("string"))) / F.lit(float(P31))


def uniform_from_id_sql(id_expr: str, seed: int = 42) -> str:
    key = "'lvl" + str(seed) + "_' || " + id_expr + "::VARCHAR"
    return f"({h31_sql(key)} / {float(P31)})"


def select_level(id_col: Column | str, m: int = 16, seed: int = 42) -> Column:
    """Level for each id: cumulative-walk over level_probs (src/main.ts:59-69),
    falling through to len(probs)−1."""
    probs = level_probs(m)
    u = uniform_from_id(id_col, seed)
    expr = F.lit(len(probs) - 1)
    cum = 0.0
    cases = []
    for lvl, p in enumerate(probs):
        cum += p
        cases.append((cum, lvl))
    for cum, lvl in reversed(cases):
        expr = F.when(u < F.lit(cum), F.lit(lvl)).otherwise(expr)
    return expr.cast("int")


def select_level_sql(id_expr: str, m: int = 16, seed: int = 42) -> str:
    probs = level_probs(m)
    u = uniform_from_id_sql(id_expr, seed)
    cum, whens = 0.0, []
    for lvl, p in enumerate(probs):
        cum += p
        whens.append(f"WHEN {u} < {cum!r} THEN {lvl}")
    return f"(CASE {' '.join(whens)} ELSE {len(probs) - 1} END)::INT"


def assign_levels(
    df: DataFrame, id_col: str = "vec_id", m: int = 16, seed: int = 42
) -> DataFrame:
    return df.withColumn("level", select_level(id_col, m, seed))


def level_histogram(
    df: DataFrame, id_col: str = "vec_id", m: int = 16, seed: int = 42
) -> DataFrame:
    """Per-level node counts — the distribution check for B1 (the reference
    tests this by mocking Math.random, tests/HNSW.test.ts:52-57; we get
    determinism from the hash instead)."""
    return (
        assign_levels(df, id_col, m, seed)
        .groupBy("level")
        .agg(F.count("*").alias("n"))
    )


def index_stats(
    df: DataFrame, id_col: str = "vec_id", m: int = 16, seed: int = 42
) -> DataFrame:
    """(n_nodes, level_max, entry_point_id): the entry point is the first
    node (insertion order = ascending id) to reach the max level — promotion
    happens only on strictly-greater level (src/main.ts:225-228)."""
    lv = assign_levels(df, id_col, m, seed)
    mx = lv.agg(F.max("level").alias("level_max"), F.count("*").alias("n_nodes"))
    entry = (
        lv.join(F.broadcast(mx), lv["level"] == mx["level_max"])
        .agg(F.min(id_col).alias("entry_point_id"))
    )
    return mx.crossJoin(entry).select("n_nodes", "level_max", "entry_point_id")
