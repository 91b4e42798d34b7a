"""One-off probe: the banded-LSH near-dup ladder one decade above the
per-round 1M cell (VERDICT r9 #8) — 10M synthetic docs end-to-end through
signature → banding → capped bucket join → exact verification, the same
pipeline `bench._dedup_ladder` measures per round at 1M.

What the decade answers: does the ladder's anti-quadratic claim HOLD as n
grows — candidate pairs tracking duplicate density (~n/10) rather than
n², and wall growing ~linearly with n (the signature pass dominates)?
At 10M the naive all-pairs bound is 5×10¹³ pairs; the ladder should
shuffle ~10⁶ candidates — a 5×10⁷× reduction, one decade more than the
1M cell's 5×10⁶×.

Results are recorded into bench.py's `dedup_ladder_10m_recorded` axis
with measured_on provenance (re-generating and signing 10M docs per round
would dominate the driver's bench budget; the 1M cell stays the per-round
regression sentinel).

Usage: python tools/dedup_ladder_10m.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from hnsw_spark.session import get_spark

    spark = get_spark(
        app_name="dedup_ladder_10m", master="local[32]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = bench._dedup_ladder(spark, 10_000_000)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
