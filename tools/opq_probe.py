"""One-off probe: does an OPQ rotation fix the PQ ADC top-k agreement?
(VERDICT r10 #5 — `ivf_pq_store.topk_agreement_adc` measured 0.725 at
m=16 on the fixture; rerank recovers 1.0 at ~2x wall.)

Measures, numpy-side at the exact shapes the ADC path serves (n=2000
corpus, 8 queries, top-10), BOTH proposed rotations against plain PQ:

- parametric OPQ (Ge, He, Ke, Sun, "Optimized Product Quantization",
  CVPR 2013, the OPQ-P closed form): eigen-decompose the sample
  covariance, allocate eigen-directions to the m subspaces balancing the
  per-subspace eigenvalue product;
- iterative OPQ (OPQ-NP): alternate sub-quantizer training with the
  orthogonal Procrustes update R <- argmin ||X R^T - reconstruction||.

Conclusion (run recorded in bench.py's `pq_adc_agreement_recorded`):
reconstruction error improves marginally (e.g. 0.217 -> 0.212 at m=16
uniform) but TOP-K AGREEMENT does not move outside noise on either a
uniform or a clustered-anisotropic corpus — at serving shapes the
agreement bottleneck is quantization noise relative to the tiny score
gap between rank-10 and rank-11 neighbors, which a rotation cannot
widen.  The honest lever is m (bytes/vector): agreement ~0.55 at m=8,
~0.76 at m=16, ~0.93 at m=32 on the uniform fixture shape.  Hence the
library ships NO rotation knob; callers size m (>= d/2 for ADC-only
serving) or rerank (operators/ann.py `rerank_with`, agreement 1.0).

Usage: python tools/opq_probe.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_spark.operators.ann import _kmeans_numpy, _normalize_rows  # noqa: E402
from hnsw_spark.operators.pq import _encode_mat, pq_reconstruct  # noqa: E402


def _train_books(x, m, nbits=8, seed=42, iters=10):
    ksub = 1 << nbits
    dsub = x.shape[1] // m
    books = []
    for j in range(m):
        c = _kmeans_numpy(
            x[:, j * dsub : (j + 1) * dsub], ksub, seed + j, iters,
            spherical=False,
        )
        if c.shape[0] < ksub:
            c = np.vstack([c] * ((ksub + c.shape[0] - 1) // c.shape[0]))[:ksub]
        books.append(c)
    return np.stack(books)


def opq_parametric(x, m):
    """OPQ-P: eigenvalue-product-balanced permutation of the PCA basis."""
    d = x.shape[1]
    dsub = d // m
    cov = np.cov(x - x.mean(0), rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = np.zeros(m)
    for i in range(d):
        open_ = [j for j in range(m) if len(buckets[j]) < dsub]
        j = min(open_, key=lambda b: logs[b])
        buckets[j].append(i)
        logs[j] += np.log(max(w[i], 1e-12))
    perm = [i for b in buckets for i in b]
    return v[:, perm].T


def opq_iterative(x, m, nbits=8, seed=42, opq_iters=8):
    """OPQ-NP: alternate codebooks and the Procrustes rotation."""
    d = x.shape[1]
    r = np.eye(d)
    for _ in range(opq_iters):
        xr = x @ r.T
        books = _train_books(xr, m, nbits, seed, iters=4)
        y = pq_reconstruct(_encode_mat(xr, books, False), books)
        u, _, vt = np.linalg.svd(x.T @ y)
        r = (u @ vt).T
    return r


def agreement(x, m, rotation):
    xn = _normalize_rows(x.astype(np.float64))
    r = rotation(xn, m) if rotation else np.eye(x.shape[1])
    xr = xn @ r.T
    books = _train_books(xr, m)
    codes = _encode_mat(xr, books, False)
    err = np.linalg.norm(xr - pq_reconstruct(codes, books)) / np.linalg.norm(xr)
    mm, ksub, dsub = books.shape
    flat = books.reshape(mm * ksub, dsub)
    offs = np.arange(mm) * ksub
    hits = 0
    for qi in range(8):
        qn = xn[qi]
        exact = set(np.argsort(-(xn @ qn))[:10])
        qr = qn @ r.T
        table = (flat * qr.reshape(mm, dsub).repeat(ksub, 0)).sum(1)
        approx = set(np.argsort(-table[codes + offs].sum(1))[:10])
        hits += len(exact & approx)
    return hits / 80, err


def main():
    rng = np.random.RandomState(7)
    uni = rng.uniform(-1, 1, (2000, 64))
    centers = rng.normal(0, 1, (32, 64))
    aniso = rng.normal(0, 1, (64, 64)) * np.linspace(1.5, 0.1, 64)
    clu = (
        centers[rng.randint(0, 32, 2000)] + rng.normal(0, 0.15, (2000, 64))
    ) @ aniso
    for name, data in (("uniform", uni), ("clustered_aniso", clu)):
        for m in (8, 16, 32):
            rows = []
            for label, rot in (
                ("plain", None),
                ("opq_parametric", opq_parametric),
                ("opq_iterative", opq_iterative),
            ):
                a, e = agreement(data, m, rot)
                rows.append(f"{label}={a:.3f}(err {e:.3f})")
            print(f"{name} m={m}: " + "  ".join(rows))


if __name__ == "__main__":
    main()
