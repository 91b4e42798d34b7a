"""PCA / whitening for embedding columns (data-driven dimensionality
reduction — the complement of the data-independent JL projection in
``functions.projection``).

Standard pipeline use: compress embeddings before ANN indexing / semantic
dedup, decorrelate before product quantization (PQ codebooks train better
on whitened residuals — Jégou et al., TPAMI 2011), and diagnose embedding
collapse via the spectrum.  Public-knowledge algorithm (Pearson 1901;
textbook covariance eigendecomposition).  No reference counterpart.

Scale design
------------
One pass: per-partition vectorized accumulation of (n, Σx, ΣxᵀX) via
``mapInPandas`` — each task emits ONE row holding a d and d·d array — then
a single-row driver reduce of those partials (partitions × d² floats, not
corpus-sized; for d=64 that is 16 KiB per partition).  The d×d eigen
decomposition runs driver-side in numpy (microseconds), and the projection
back over the corpus is a second vectorized pass with the (d, k) loading
matrix broadcast.  Nothing corpus-sized is ever collected or shuffled:
cost = 2 corpus scans + one 1-row reduce, at any corpus size.

Determinism: eigenvector SIGNS are canonicalized (largest-|component|
coordinate made positive), so the decomposition is reproducible across
LAPACK builds up to eigenvalue ties, and the gates avoid comparing raw
eigenvectors altogether (trace/reconstruction bounds only).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_stats(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, covariance) of the vector column in one distributed pass.

    Population covariance (divide by n), float64 accumulation.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s = m.sum(0) if s is None else s + m.sum(0)
            g = m.T @ m
            ss = g if ss is None else ss + g
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
        )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("covariance_stats: empty input")
    n = sum(r.n for r in rows)
    s = np.sum([np.asarray(r.s) for r in rows], axis=0)
    ss = np.sum([np.asarray(r.ss) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(
    df: DataFrame, k: int, vec_col: str = "embedding"
) -> dict:
    """Fit PCA: returns {mean, components (k, d), eigenvalues (desc, full
    spectrum), n}.  Component signs canonicalized for reproducibility."""
    n, mean, cov = covariance_stats(df, vec_col)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    evecs = evecs[:, order]
    # sign canonicalization: make the largest-|x| coordinate positive
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return {
        "mean": mean,
        "components": evecs[:, :k].T.copy(),
        "eigenvalues": evals,
        "n": n,
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project (and optionally whiten) the vector column; all other
    columns pass through.  Vectorized second pass, loadings broadcast."""
    sc = df.sparkSession.sparkContext
    k = model["components"].shape[0]
    w = model["components"].T.copy()  # (d, k)
    if whiten:
        w = w / np.sqrt(np.maximum(model["eigenvalues"][:k], eps))
    bc = sc.broadcast((model["mean"], w))
    cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, load = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (m - mean) @ load
            out = pdf[cols].copy()
            out[out_col] = list(p.astype(np.float32))
            yield out

    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in cols
    )
    return df.mapInPandas(project, f"{schema}, {out_col} array<float>")
