"""Rank-fusion retrieval operators.

Hybrid search — fusing a vector arm (embedding similarity) with a text arm
(lexical overlap) — is the standard modern retrieval stack; reciprocal rank
fusion (RRF, Cormack et al. 2009) is the fusion rule that needs no score
calibration between arms: ``score(d) = Σ_arms 1/(k + rank_arm(d))``.

Scale design: each arm is already a ranked DataFrame (rank = dense 1-based);
fusion is a full-outer join on the doc id — one shuffle on the id, arm count
is small and static.  Absent ranks contribute 0 (the document simply wasn't
retrieved by that arm), which is RRF's standard missing-list handling.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked arms into (id, rrf) by reciprocal rank: each arm is a
    DataFrame[(id_col, rank_col)] with 1-based ranks; a doc absent from an
    arm contributes nothing for that arm."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    scored = [
        df.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(f"_s{i}"),
        )
        for i, df in enumerate(arms)
    ]
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), scored)
    rrf = reduce(
        lambda acc, i: acc + F.coalesce(F.col(f"_s{i}"), F.lit(0.0)),
        range(1, len(arms)),
        F.coalesce(F.col("_s0"), F.lit(0.0)),
    )
    return joined.select("id", rrf.alias("rrf"))
