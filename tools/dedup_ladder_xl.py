"""One-off probe: the banded-LSH near-dup ladder at an arbitrary decade —
the 100M point is VERDICT r10 #8, two decades above the per-round 1M cell
and one above `dedup_ladder_10m_recorded`.  Same pipeline end-to-end
(signature → banding → capped bucket join → exact verification of the
surviving candidates), same ledger: candidate pairs must track DUPLICATE
DENSITY (~n/10 planted pairs), never n², and wall must stay ~linear in n
(signature-stage-bound).

At 100M the naive all-pairs bound is 5×10¹⁵ pairs; the ladder should
shuffle ~10⁷ candidates — a 5×10⁸× reduction, one decade more than 10M's
5×10⁷×.  Results are recorded into bench.py's recorded axes with
measured_on provenance (a 100M generate+sign run costs ~2 h — strictly a
one-off; the 1M cell stays the per-round regression sentinel).

Usage: SPARK_DRIVER_MEM=48g python tools/dedup_ladder_xl.py [n_docs]
       (default n_docs = 100_000_000; partitions scale as n/250k, min 32)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from hnsw_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n_parts = max(32, min(512, n_docs // 250_000))
    spark = get_spark(
        app_name="dedup_ladder_xl", master="local[32]",
        shuffle_partitions=max(64, n_parts),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = bench._dedup_ladder(spark, n_docs, n_parts=n_parts)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
