"""Materialized-view navigation: answer coarse aggregations from a finer
pre-aggregated summary table instead of the raw corpus.

The oldest trick in data warehousing, and the highest-leverage one at
100 TB: an (hour, key) rollup is ~10⁶× smaller than its event stream, and
every query whose grouping keys are a SUBSET of the rollup's keys and
whose aggregates are DERIVABLE from the rollup's stored state (counts sum,
sums sum, mins min, maxes max — averages derive as sum/count) can be
answered from it exactly, scanning kilobytes instead of terabytes.

Exactness leans on the repo's fixed-point convention: summary tables store
the per-row-quantized integer sums (``dquant`` → decimal accumulator, see
``incremental_rollup``), so re-aggregating partials equals recomputing
from raw — the mergeability property the IVM query hash-proves.

This is deliberately a library, not an optimizer hook: callers ask the
catalog to answer a (keys, aggs) request and compose the result; a full
Catalyst rewrite rule would need the same containment test this module
makes explicit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# stored-state kinds and how they re-aggregate
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


@dataclass
class Matview:
    name: str
    df: DataFrame
    keys: tuple[str, ...]
    # column -> state kind ("count" | "sum" | "min" | "max")
    state: dict[str, str] = field(default_factory=dict)


class MatviewCatalog:
    def __init__(self):
        self._views: dict[str, Matview] = {}

    def register(
        self, name: str, df: DataFrame, keys: list[str], state: dict[str, str]
    ) -> None:
        for col, kind in state.items():
            if kind not in _MERGE:
                raise ValueError(f"unmergeable state kind {kind!r} for {col!r}")
        self._views[name] = Matview(name, df, tuple(keys), dict(state))

    def answer(
        self, keys: list[str], aggs: dict[str, str]
    ) -> DataFrame | None:
        """Answer groupBy(keys).agg(aggs) from the smallest containing view,
        or None if no registered view can serve it exactly.

        ``aggs`` maps output column -> state column (which implies the
        merge function via the view's state kind).  Containment test:
        requested keys ⊆ view keys AND every requested state column is
        stored.  Among candidates the FEWEST-keys view wins — it is the
        most pre-aggregated, i.e. the least data to scan.
        """
        candidates = [
            v
            for v in self._views.values()
            if set(keys) <= set(v.keys)
            and all(src in v.state for src in aggs.values())
        ]
        if not candidates:
            return None
        view = min(candidates, key=lambda v: len(v.keys))
        merged = [
            _MERGE[view.state[src]](src).alias(out)
            for out, src in aggs.items()
        ]
        return view.df.groupBy(*keys).agg(*merged)
