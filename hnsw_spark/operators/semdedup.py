"""SemDeDup: semantic deduplication over an embedding column.

Cluster the corpus embeddings with a coarse k-means quantizer, then drop
every document that has a semantic near-duplicate (cosine ≥ τ) with a
smaller id inside its cluster (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" — public knowledge).
No reference counterpart; beyond-reference pipeline operator.

Scale design
------------
The candidate set is Σ cluster² — never corpus² — by routing through
``operators.ann.ivf_self_join`` (``n_probe=1`` scores each vector only
against its own inverted list — the SemDeDup recipe exactly; ``n_probe>1``
additionally recovers cluster-boundary pairs at Σ(probe·list)² cost): one
k-means training sample, one vectorized assignment pass, one BLAS gram
matrix per cluster, with the existing mega-list salting guard bounding
per-task work under centroid skew.  The keep-min-id rule then costs one
distinct on the dropped side and one left-anti join — both on the id key.

``n_clusters=1`` (or ``exact=True``) degenerates to the exact all-pairs
semantics: every near-dup pair is observed, which is how the oracle
verifies the operator end-to-end, and the clustered tier is gated against
that exact tier (survivors must be a superset; dropped-count recall must
clear a floor) the same way the ANN tiers gate recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exact: bool = False,
    max_list: int | None = 8192,
) -> DataFrame:
    """Survivors after keep-min-id semantic dedup: every input column, minus
    rows having a smaller-id near-duplicate (cosine ≥ threshold) in their
    cluster (or anywhere, when exact)."""
    from hnsw_spark.operators.ann import ivf_self_join
    from hnsw_spark.operators.dedup import embedding_neardup

    if exact or n_clusters <= 1:
        pairs = embedding_neardup(
            df, threshold, id_col=id_col, vec_col=vec_col, strategy="brute"
        )
    else:
        pairs = ivf_self_join(
            df,
            threshold,
            n_lists=n_clusters,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            max_list=max_list,
        )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")
