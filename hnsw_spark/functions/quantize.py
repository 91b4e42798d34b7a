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


BITS_PER_WORD = 32


def binarize(vec: Column | str, dim: int) -> Column:
    """Sign-bit pack: ``array<bigint>`` of ⌈dim/32⌉ 32-bit words; bit j of
    word w is set iff v[32w+j] > 0.

    1 bit/dim is the extreme ANN compression tier (32× vs float32): a 100 TB
    float corpus becomes ~3 TB of codes that fit executor memory, and Hamming
    distance over the codes is pure integer XOR+popcount inside whole-stage
    codegen — no Python, no floats, no shuffle.  32-bit words (not 64) keep
    every per-word value < 2³¹ so the same packing is exactly reproducible
    in engines whose only integer is a signed BIGINT.
    """
    n_words = (dim + BITS_PER_WORD - 1) // BITS_PER_WORD
    v = _dbl(vec)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(BITS_PER_WORD - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: F.when(
                (w * BITS_PER_WORD + j < F.size(v))
                & (F.get(v, w * BITS_PER_WORD + j) > 0.0),
                acc + F.pow(F.lit(2.0), j).cast("long"),
            ).otherwise(acc),
        ),
    )


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two packed codes: Σ popcount(aᵢ ⊕ bᵢ)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ac, bc, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
