"""Embedding quantization column builders (int8 symmetric, per-vector scale).

A 100 TB embedding corpus at float32 is 4× the memory/IO of int8; symmetric
per-vector quantization (scale = max|v|/127, q = round(v/scale)) is the
standard ANN compression step (the FAISS ScalarQuantizer recipe) and loses
<0.5% recall at 8 bits for typical embeddings.  Pure Catalyst higher-order
functions — the quantize/dequantize hot path stays JVM-side in whole-stage
codegen, no Python boundary — so it composes with the IVF/HNSW tiers and the
SQL oracle can reproduce it bit-for-bit.

Zero vectors quantize to all-zero with scale 0 and dequantize back to zero
(the scale==0 guard avoids 0/0 NaNs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def quant_scale(vec: Column | str) -> Column:
    """Per-vector symmetric scale: max|vᵢ| / 127 (double)."""
    return F.array_max(F.transform(_dbl(vec), F.abs)) / F.lit(127.0)


def quantize(vec: Column | str, scale: Column | None = None) -> Column:
    """int8 codes as array<int> in [-127, 127]: round(vᵢ / scale)."""
    v = _dbl(vec)
    s = quant_scale(vec) if scale is None else scale
    return F.when(
        s == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.round(x / s).cast("int")))


def dequantize(qvec: Column | str, scale: Column | str) -> Column:
    """Reconstruct array<float>: qᵢ · scale."""
    q = F.col(qvec) if isinstance(qvec, str) else qvec
    s = F.col(scale) if isinstance(scale, str) else scale
    return F.transform(q, lambda x: (x.cast("double") * s).cast("float"))


def reconstruction_error(vec: Column | str, qvec: Column, scale: Column) -> Column:
    """max_i |vᵢ − qᵢ·scale| — by construction ≤ scale/2, i.e. max|v|/254."""
    return F.array_max(
        F.zip_with(
            _dbl(vec), qvec, lambda a, b: F.abs(a - b.cast("double") * scale)
        )
    )
