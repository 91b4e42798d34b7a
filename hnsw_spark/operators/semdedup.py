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
clear a floor) the same way the ANN tiers gate recall.  The exact tier is
computed as a distributed broadcast-BLAS pass (``_exact_dropped_ids``):
one bounded collect + broadcast of the normalized corpus matrix, then a
per-partition ``chunk @ corpusᵀ`` gemm — ~50× the per-pair Catalyst
kernel's throughput at bench scale, row-gated at
``EXACT_BROADCAST_MAX_ROWS`` so the quadratic plan can never be reached
at 100 TB (the clustered tier is the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Row gate for the exact tier's broadcast corpus matrix.  64k rows × 64
#: dims of float64 is ~32 MB on the wire — comfortably broadcastable; past
#: this the exact tier is the wrong tool anyway (O(n²) flops) and callers
#: must use the clustered tier.
EXACT_BROADCAST_MAX_ROWS = 65_536


def _exact_dropped_ids(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Ids dropped by exact keep-min-id dedup: every id with a smaller-id
    neighbour at cosine ≥ threshold, computed as one distributed BLAS pass.

    The whole corpus (bounded by ``EXACT_BROADCAST_MAX_ROWS``) is collected
    once, L2-normalized in float64, and broadcast; each input partition then
    scores its chunk against the full matrix with one ``chunk @ corpusᵀ``
    gemm and keeps rows where any strictly-smaller id clears the threshold.
    The n² flops are split across partitions (each task does |chunk|·n), so
    the exact tier parallelizes like the clustered one — it just cannot
    prune.  Zero-norm rows are excluded from BOTH sides: cosine against a
    zero vector is 0/0 → NULL in the SQL oracle, which never satisfies
    ``≥ threshold``, so a zero-norm row neither drops others nor is dropped.

    Decision-level parity with the per-pair Catalyst kernel and the DuckDB
    oracle: normalize-then-dot reorders the double arithmetic (same as the
    IVF BLAS scorer, ann.py), which moves cosines by ~1 ulp — irrelevant to
    a ≥-threshold decision away from the boundary, and the oracle output
    carries no float columns.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # NULL ids are excluded on BOTH sides up front: the int64 numpy cast
    # below would crash on one, and the SQL oracle's `a.id < b.id`
    # comparison is never true for NULL, so exclusion IS the oracle
    # semantics (ADVICE r4).
    src = df.select(id_col, vec_col).filter(F.col(id_col).isNotNull())
    pdf = src.limit(EXACT_BROADCAST_MAX_ROWS + 1).toPandas()
    if len(pdf) > EXACT_BROADCAST_MAX_ROWS:
        raise ValueError(
            f"exact semantic_dedup is gated at {EXACT_BROADCAST_MAX_ROWS}"
            " rows; use the clustered tier (exact=False) at this scale"
        )
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
        dtype=np.float64,
    )
    norms = np.linalg.norm(mat, axis=1)
    nz = norms > 0.0
    ids, mat = ids[nz], mat[nz] / norms[nz, None]
    bc = spark.sparkContext.broadcast((ids, mat))
    tau = float(threshold)

    def score(batches):
        all_ids, corpus = bc.value
        for pdf_b in batches:
            if pdf_b.empty:
                continue
            b_ids = pdf_b[id_col].to_numpy(dtype=np.int64)
            bm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf_b[vec_col]],
                dtype=np.float64,
            )
            bn = np.linalg.norm(bm, axis=1)
            ok = bn > 0.0
            if not ok.any():
                continue
            b_ids, bm = b_ids[ok], bm[ok] / bn[ok, None]
            sims = bm @ corpus.T
            smaller = all_ids[None, :] < b_ids[:, None]
            dropped = ((sims >= tau) & smaller).any(axis=1)
            if dropped.any():
                yield pd.DataFrame({id_col: b_ids[dropped]})

    return src.mapInPandas(score, schema=f"{id_col} long")


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
    cluster (or anywhere, when exact).

    NOTE: the exact tier is EAGER at call time — it drives a bounded
    driver collect (``toPandas`` of at most ``EXACT_BROADCAST_MAX_ROWS``
    id+vector rows) to build the broadcast corpus matrix, and the source
    is scanned a second time by the scoring ``mapInPandas`` pass.  The
    clustered tier (``exact=False``, the 100 TB path) stays fully lazy."""
    from hnsw_spark.operators.ann import ivf_self_join

    if exact or n_clusters <= 1:
        dropped = _exact_dropped_ids(df, threshold, id_col, vec_col)
        return df.join(dropped, id_col, "left_anti")
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
