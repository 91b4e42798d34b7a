"""fvecs / ivecs vector-file sources (reference S1/S2/S4,
src/bench/dataset.ts:65-151).

Format: per record, a little-endian int32 dimension header followed by
``dim`` little-endian float32 (fvecs) or int32 (ivecs) elements.  Ids are the
0-based record position within each file (reference semantics: one dataset
per file, ids 0..n−1).

Spark mapping: ``binaryFile`` scan (one row per file — fvecs is not
splittable) + an Arrow-batched ``mapInPandas`` numpy decode.  ``limit`` /
``offset`` are honored inside the decoder (the reference's scan pushdown,
dataset.ts:87-88).  For anything at scale, convert once with
``fvecs_to_parquet`` — Parquet is splittable, column-pruned, and
predicate-pushed; the raw decoders exist for format parity and ingest.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def decode_fvecs(
    data: bytes,
    limit: int | None = None,
    offset: int = 0,
    element_dtype: str = "<f4",
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) from an fvecs/ivecs buffer; validates record framing."""
    if len(data) == 0:
        return np.empty(0, np.int64), np.empty((0, 0), np.float32)
    dim = int(np.frombuffer(data, "<i4", count=1)[0])
    if dim <= 0:
        raise ValueError(f"invalid fvecs dimension header: {dim}")
    rec_bytes = 4 + 4 * dim
    if len(data) % rec_bytes != 0:
        raise ValueError(
            f"corrupt fvecs file: {len(data)} bytes not a multiple of {rec_bytes}"
        )
    n = len(data) // rec_bytes
    raw = np.frombuffer(data, "<i4").reshape(n, dim + 1)
    dims = raw[:, 0]
    if not (dims == dim).all():
        raise ValueError("corrupt fvecs file: varying dimension headers")
    vecs = raw[:, 1:].view(element_dtype) if element_dtype != "<i4" else raw[:, 1:]
    end = n if limit is None else min(n, offset + limit)
    ids = np.arange(offset, end, dtype=np.int64)
    return ids, np.ascontiguousarray(vecs[offset:end]).astype(np.float32)


def _reader(element_dtype: str, limit: int | None, offset: int):
    def read_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids, vecs = decode_fvecs(row["content"], limit, offset, element_dtype)
                yield pd.DataFrame(
                    {
                        "path": row["path"],
                        "vec_id": ids,
                        "embedding": list(vecs),
                    }
                )

    return read_files


_SCHEMA = "path string, vec_id long, embedding array<float>"


def read_fvecs(
    spark: SparkSession, path: str, limit: int | None = None, offset: int = 0
) -> DataFrame:
    """S1: fvecs scan with limit/offset pushdown into the decoder."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return binary.mapInPandas(_reader("<f4", limit, offset), schema=_SCHEMA)


def read_ivecs_as_float(
    spark: SparkSession, path: str, limit: int | None = None, offset: int = 0
) -> DataFrame:
    """S2: ivecs scan with int32 → float32 element cast."""
    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return binary.mapInPandas(_reader("<i4", limit, offset), schema=_SCHEMA)


def stream_fvecs(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S4 streaming fvecs scan (reference src/bench/dataset.ts:153-194):
    vectors arrive incrementally as files land; Spark's file source handles
    chunk/recovery concerns the reference's manual boundary-safe decoder
    managed by hand.  One whole file decodes per record batch (fvecs is not
    splittable); cap ingest rate with ``max_files_per_trigger``."""
    binary = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path", "content")
    )
    return binary.mapInPandas(_reader("<f4", None, 0), schema=_SCHEMA)


def write_fvecs(path: str, matrix: np.ndarray) -> None:
    """Test/fixture helper: encode a (n, dim) float32 matrix as fvecs."""
    m = np.ascontiguousarray(matrix, dtype=np.float32)
    n, dim = m.shape
    out = np.empty((n, dim + 1), dtype="<i4")
    out[:, 0] = dim
    out[:, 1:] = m.view("<i4")
    with open(path, "wb") as f:
        f.write(out.tobytes())


def fvecs_to_parquet(spark: SparkSession, src: str, dest: str) -> None:
    """One-time conversion to the scale-friendly format."""
    read_fvecs(spark, src).drop("path").write.mode("overwrite").parquet(dest)
