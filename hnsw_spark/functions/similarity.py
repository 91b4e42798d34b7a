"""Similarity kernels as Catalyst column builders.

Parity target: reference ``src/similarity.ts`` (dotProduct :2-8,
cosineSimilarity :10-12, euclideanDistance :14-20, euclideanSimilarity :22-24)
and the metric dispatch in ``src/main.ts:37-45``.

Design: pure higher-order functions (``zip_with`` + ``aggregate``) — these stay
JVM-side inside whole-stage codegen, so the scoring hot path never crosses the
Python boundary.  Elements are cast to double before accumulating: the
reference stores float32 but scores in float64 (JS numbers), and left-to-right
double accumulation is deterministic, which keeps results bit-comparable with
a single-threaded oracle.

Semantics notes:
- cosine of a zero-norm vector: the reference has no guard and yields NaN
  (0/0).  Spark's non-ANSI double division returns NULL for x/0; to match the
  reference we emit NaN explicitly when either norm is zero.
- ``euclidean_similarity`` is the reference's monotone inversion 1/(1+dist)
  so that "higher is better" holds for both metrics (README.md:80).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Metric = str
VALID_METRICS = ("cosine", "euclidean")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in float64, left-to-right (reference src/similarity.ts:2-8)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NaN when either norm is zero
    (reference src/similarity.ts:10-12 — no zero-norm guard, 0/0 → NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(float("nan"))).otherwise(
        dot_product(a, b) / denom
    )


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """√Σ(aᵢ−bᵢ)² (reference src/similarity.ts:14-20)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def euclidean_similarity(a: Column | str, b: Column | str) -> Column:
    """1 / (1 + dist) — monotone inversion (reference src/similarity.ts:22-24)."""
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance(a, b))


def get_metric(metric: Metric) -> Callable[[Column | str, Column | str], Column]:
    """Metric-name dispatch; unknown metric raises, matching the reference's
    ``Invalid metric`` throw (src/main.ts:42-44)."""
    if metric == "cosine":
        return cosine_similarity
    if metric == "euclidean":
        return euclidean_similarity
    raise ValueError(f"Invalid metric: {metric!r} (expected one of {VALID_METRICS})")
