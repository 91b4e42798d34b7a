"""Physical-plan audit helpers: capture Catalyst's formatted plan and
reduce it to the scale-relevant facts — how many shuffles, which joins
broadcast, whether filters/projections reached the parquet scan, and how
much of the plan runs inside whole-stage codegen.

Used two ways:
- ``tools/plan_audit.py`` renders PLANS.md, the committed plan-shape audit
  of every headline query (the "would this survive 100×?" evidence).
- ``tests/test_plans.py`` pins invariants (shuffle budget per query, small
  sides broadcast, scan-level column pruning) so a refactor that silently
  adds an exchange or un-prunes a scan fails CI, not the cluster.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# ops that materialize a shuffle boundary; BroadcastExchange is counted
# separately (it moves a small side, not the big table)
_OP_LINE = re.compile(r"^\(\d+\)\s+(\S+.*?)(?:\s+\[codegen id : \d+\])?\s*$")


@dataclass
class PlanFacts:
    ops: list[str] = field(default_factory=list)
    text: str = ""

    def count(self, op: str) -> int:
        return sum(1 for o in self.ops if o == op or o.startswith(op + " "))

    @property
    def shuffles(self) -> int:
        return self.count("Exchange")

    @property
    def broadcasts(self) -> int:
        return self.count("BroadcastExchange")

    @property
    def broadcast_joins(self) -> int:
        return self.count("BroadcastHashJoin") + self.count(
            "BroadcastNestedLoopJoin"
        )

    @property
    def sort_merge_joins(self) -> int:
        return self.count("SortMergeJoin")

    @property
    def scans(self) -> int:
        return self.count("Scan parquet")

    @property
    def codegen_ops(self) -> int:
        """Operators inside whole-stage codegen: tree lines are starred
        (``* Filter (3)``).  (Codegen *ids* are absent from AQE initial
        plans, so the star marker is the portable signal.)"""
        return len(re.findall(r"\*\s+\w[\w ]*\(\d+\)", self.text))

    @property
    def python_stages(self) -> int:
        return sum(
            self.count(o)
            for o in ("MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython",
                      "ArrowEvalPython", "FlatMapCoGroupsInPandas")
        )

    def read_schemas(self) -> list[str]:
        return re.findall(r"ReadSchema: struct<([^>]*)>", self.text)

    def pushed_filters(self) -> list[str]:
        return re.findall(r"PushedFilters: \[([^\]]*)\]", self.text)


def plan_facts(df: DataFrame) -> PlanFacts:
    """Formatted physical plan → structured facts.

    Captured with AQE momentarily OFF: the AQE *initial* plan hides
    whole-stage-codegen markers entirely (codegen is decided at execution),
    so the static plan is the only pre-execution view that shows them.  The
    runtime AQE plan can only improve on it — coalescing partitions and
    converting eligible SMJs to broadcast."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    buf = io.StringIO()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    text = buf.getvalue()
    ops = []
    for line in text.splitlines():
        m = _OP_LINE.match(line.strip())
        if m:
            ops.append(m.group(1).strip())
    return PlanFacts(ops=ops, text=text)
