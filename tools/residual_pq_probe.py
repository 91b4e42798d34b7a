"""One-off probe: does RESIDUAL encoding (IVFADC, Jégou et al. 2011 §IV)
move PQ ADC top-k agreement where OPQ rotations could not? (VERDICT r11
#3 — the one design avenue the r10 adjudication left untried.)

Hypothesis: tools/opq_probe.py showed the agreement bottleneck is
quantization noise relative to the tiny rank-10/11 score gap.  Rotations
re-shape the SAME variance; residual encoding REMOVES the variance the
coarse quantizer already explains, so on clustered corpora the same m
bytes quantize a much smaller signal — and the coarse q·centroid term is
added back exactly at search time.

Two measurements:

1. numpy-side at tools/opq_probe.py's exact shapes (2000×64 uniform and
   clustered-anisotropic, 8 queries, top-10), plain vs residual at
   m = 8/16/32 — directly comparable to `pq_adc_agreement_recorded`;
2. Spark-side through the REAL `build_ivf_index(store='pq')` path at a
   clustered-at-scale shape (250k×64, n_lists=128, Q=64 by default —
   n_lists ≈ the generator's 128 clusters, the regime residual targets):
   ADC-only top-10 agreement vs exact BLAS at the same generous n_probe
   for both variants, so routing loss is held constant and the delta is
   purely the encoding.  The full 1M×64 shape was attempted and is
   recorded where it got before the round's wall budget cut it: plain
   m=8 ADC-only agreement at 1M clustered = 0.0063 (a measured null —
   ADC-only serving at that scale/m ranks by quantization noise; builds
   cost ~980 s each on this box, which is why the recorded axis runs at
   250k).

Usage: python tools/residual_pq_probe.py [--spark] [n_base]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnsw_spark.operators.ann import _kmeans_numpy, _normalize_rows  # noqa: E402
from hnsw_spark.operators.pq import _encode_mat  # noqa: E402
from tools.opq_probe import _train_books  # noqa: E402


def agreement_numpy(x: np.ndarray, m: int, residual: bool, n_lists: int = 32):
    xn = _normalize_rows(x.astype(np.float64))
    if residual:
        cents = _normalize_rows(
            _kmeans_numpy(xn, n_lists, 42, 10, spherical=True)
        )
        lids = np.argmax(xn @ cents.T, axis=1)
        train = xn - cents[lids]
    else:
        train = xn
    books = _train_books(train, m)
    codes = _encode_mat(train, books, normalize=False)
    mm, ksub, dsub = books.shape
    flat = books.reshape(mm * ksub, dsub)
    offs = np.arange(mm) * ksub
    hits = 0
    for qi in range(8):
        qn = xn[qi]
        exact = set(np.argsort(-(xn @ qn))[:10])
        table = (flat * qn.reshape(mm, dsub).repeat(ksub, 0)).sum(1)
        scores = table[codes + offs].sum(1)
        if residual:
            scores = scores + (cents @ qn)[lids]
        approx = set(np.argsort(-scores)[:10])
        hits += len(exact & approx)
    return hits / 80


def spark_probe(n_base: int = 250_000, n_lists: int = 128, n_probe: int = 16):
    from pyspark.sql import functions as F

    from hnsw_spark.operators.ann import build_ivf_index
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.session import get_spark
    from hnsw_spark.sources.synthetic import synthetic_vectors

    spark = get_spark(app_name="residual_pq_probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = (
        synthetic_vectors(spark, n_base, 64, seed=17, distribution="clustered")
        .repartition(32)
        .cache()
    )
    big.count()
    q = big.filter(F.col("vec_id") < 64).cache()
    q.count()
    exact = {
        (r.query_id, r.id)
        for r in knn_exact(
            big, q, k=10, metric="cosine", strategy="local_merge"
        ).collect()
    }
    out = {}
    for label, res in (("plain", False), ("residual", True)):
        for m in (8, 16):
            t0 = time.time()
            idx = build_ivf_index(
                big, n_lists=n_lists, metric="cosine", store="pq",
                pq_m=m, pq_residual=res,
            )
            idx.index_df = idx.index_df.cache()
            idx.index_df.count()
            build_s = time.time() - t0
            t0 = time.time()
            got = {
                (r.query_id, r.id)
                for r in idx.search(q, k=10, n_probe=n_probe).collect()
            }
            search_s = time.time() - t0
            agree = len(got & exact) / max(len(exact), 1)
            out[f"{label}_m{m}"] = {
                "agreement": round(agree, 4),
                "build_s": round(build_s, 1),
                "search_s": round(search_s, 2),
            }
            print(
                f"1M clustered {label} m={m}: agreement={agree:.4f} "
                f"(build {build_s:.1f}s search {search_s:.2f}s)",
                flush=True,
            )
            idx.index_df.unpersist()
    q.unpersist()
    big.unpersist()
    spark.stop()
    return out


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
            plain = agreement_numpy(data, m, residual=False)
            res = agreement_numpy(data, m, residual=True)
            print(f"{name} m={m}: plain={plain:.3f}  residual={res:.3f}")
    if "--spark" in sys.argv:
        n = next((int(a) for a in sys.argv[1:] if a.isdigit()), 1_000_000)
        spark_probe(n)


if __name__ == "__main__":
    main()
