"""NumPy ``.npy`` tensor-file source — a REAL binary codec tier (format
spec: numpy/lib/format.py, public NEP 1 "NPY format" v1.0/2.0).

Framing parsed from first principles (no ``np.load``): 6-byte magic
``\\x93NUMPY``, 1-byte major/minor version, a little-endian header length
(2 bytes for v1.x, 4 for v2.x), then an ASCII Python-literal dict
``{'descr': '<f4', 'fortran_order': False, 'shape': (n, d)}`` padded so
the payload starts 64-byte aligned, followed by the raw C-order buffer.
The decoder validates each field and rejects fortran order / non-2-D /
non-float32 tensors explicitly rather than misreading them.

Spark mapping mirrors the fvecs tier (same module shape as
``sources/fvecs.py``, reference S1 src/bench/dataset.ts:65-101):
``binaryFile`` scan + Arrow-batched ``mapInPandas`` decode, ids = 0-based
row position, ``limit``/``offset`` pushdown inside the decoder.  ``.npy``
is not splittable; at scale convert once to Parquet — this tier exists
because embedding dumps from training jobs overwhelmingly land as ``.npy``
and ingest must read them where they are.
"""

from __future__ import annotations

import ast
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"\x93NUMPY"


def decode_npy(
    data: bytes, limit: int | None = None, offset: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) from a v1.x/v2.x ``.npy`` buffer holding a C-order
    2-D float32 tensor; validates magic, version, header dict, and payload
    length."""
    if len(data) < 10 or data[:6] != _MAGIC:
        raise ValueError("not an NPY file: bad magic")
    major, minor = data[6], data[7]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", data, 8)
        hstart = 10
    elif major == 2:
        (hlen,) = struct.unpack_from("<I", data, 8)
        hstart = 12
    else:
        raise ValueError(f"unsupported NPY version {major}.{minor}")
    header = data[hstart : hstart + hlen].decode("latin1")
    try:
        meta = ast.literal_eval(header.strip())
    except (ValueError, SyntaxError) as exc:
        raise ValueError(f"corrupt NPY header: {header!r}") from exc
    descr, fortran, shape = (
        meta.get("descr"),
        meta.get("fortran_order"),
        meta.get("shape"),
    )
    if descr not in ("<f4", "|f4"):
        raise ValueError(f"unsupported NPY dtype {descr!r} (need '<f4')")
    if fortran:
        raise ValueError("fortran_order NPY tensors are not supported")
    if not (isinstance(shape, tuple) and len(shape) == 2):
        raise ValueError(f"need a 2-D tensor, got shape {shape!r}")
    n, dim = int(shape[0]), int(shape[1])
    payload = data[hstart + hlen :]
    want = n * dim * 4
    if len(payload) < want:
        raise ValueError(
            f"truncated NPY payload: {len(payload)} < {want} bytes"
        )
    mat = np.frombuffer(payload, "<f4", count=n * dim).reshape(n, dim)
    end = n if limit is None else min(n, offset + limit)
    ids = np.arange(offset, end, dtype=np.int64)
    return ids, np.ascontiguousarray(mat[offset:end])


_SCHEMA = "path string, vec_id long, embedding array<float>"


def read_npy(
    spark: SparkSession, path: str, limit: int | None = None, offset: int = 0
) -> DataFrame:
    """NPY tensor scan with limit/offset pushdown into the decoder."""

    def read_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids, vecs = decode_npy(row["content"], limit, offset)
                yield pd.DataFrame(
                    {
                        "path": row["path"],
                        "vec_id": ids,
                        "embedding": list(vecs),
                    }
                )

    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return binary.mapInPandas(read_files, schema=_SCHEMA)


def write_npy(path: str, matrix: np.ndarray) -> None:
    """Encode a (n, dim) float32 matrix as NPY v1.0 with the spec's 64-byte
    header alignment — written from first principles so the test suite can
    cross-check our writer against our reader AND against numpy's own."""
    m = np.ascontiguousarray(matrix, dtype="<f4")
    n, dim = m.shape
    header = (
        "{'descr': '<f4', 'fortran_order': False, "
        f"'shape': ({n}, {dim}), }}"
    )
    # pad with spaces + trailing newline so magic+version+len+header ≡ 0 (mod 64)
    unpadded = len(_MAGIC) + 2 + 2 + len(header) + 1
    pad = (64 - unpadded % 64) % 64
    header_b = (header + " " * pad + "\n").encode("latin1")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(bytes([1, 0]))
        f.write(struct.pack("<H", len(header_b)))
        f.write(header_b)
        f.write(m.tobytes())
