"""Parquet footer metadata as a DataFrame: the scan-pruning substrate.

At 100 TB, the difference between a full scan and an interactive query is
row-group pruning: every parquet footer carries per-row-group min/max
statistics, and a predicate like ``l_quantity < 5`` can skip every row
group whose footer minimum already exceeds 5 — without reading a single
data page.  Spark's parquet reader does this internally
(``spark.sql.parquet.filterPushdown``); this module surfaces the same
metadata AS A DATAFRAME so pipelines can build manifests, estimate
selectivity, audit layout quality (are row groups actually prunable for
the predicates we run?), and pick re-sort/Z-order candidates.

Scale shape: the file list fans out over executors (one task per file
batch); each task opens ONLY footers (a few KB per file, never data pages)
via pyarrow.  A 100k-file table yields a 100k×groups row manifest — a
skinny frame that joins/aggregates like any other.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ROWGROUP_SCHEMA = (
    "file string, row_group int, num_rows long, "
    "stat_min double, stat_max double"
)


def _footer_rows(files: list[str], column: str) -> list[tuple]:
    import pyarrow.parquet as pq

    out = []
    for path in files:
        meta = pq.ParquetFile(path).metadata
        name_to_idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        } if meta.num_row_groups else {}
        ci = name_to_idx.get(column)
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            stats = rg.column(ci).statistics if ci is not None else None
            out.append(
                (
                    os.path.basename(path),
                    g,
                    rg.num_rows,
                    float(stats.min) if stats and stats.has_min_max else None,
                    float(stats.max) if stats and stats.has_min_max else None,
                )
            )
    return out


def rowgroup_stats(
    spark: SparkSession, table_path: str, column: str
) -> DataFrame:
    """Footer-only row-group manifest for a parquet table:
    DataFrame[(file, row_group, num_rows, stat_min, stat_max)] for
    ``column``.  Footers are read ON EXECUTORS (mapInPandas over the file
    list) — the driver only lists paths, as a catalog would."""
    files = sorted(
        glob.glob(os.path.join(table_path, "*.parquet"))
        or ([table_path] if table_path.endswith(".parquet") else [])
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {table_path!r}")
    files_df = spark.createDataFrame([(f,) for f in files], "path string")

    def read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = _footer_rows(list(pdf["path"]), column)
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "num_rows", "stat_min", "stat_max"],
            )

    return files_df.mapInPandas(read_footers, ROWGROUP_SCHEMA)


def rowgroup_exact_stats(
    spark: SparkSession, table_path: str, column: str
) -> DataFrame:
    """Ground truth for the footer gate: per-row-group (num_rows, min, max)
    computed by READING each row group's single column (column-pruned
    row-group reads on executors).  Only for audits/tests — the whole point
    of footers is not doing this."""
    files = sorted(
        glob.glob(os.path.join(table_path, "*.parquet"))
        or ([table_path] if table_path.endswith(".parquet") else [])
    )
    files_df = spark.createDataFrame([(f,) for f in files], "path string")

    def read_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                pf = pq.ParquetFile(path)
                for g in range(pf.metadata.num_row_groups):
                    col = pf.read_row_group(g, columns=[column]).column(0)
                    vals = col.to_pandas()
                    rows.append(
                        (
                            os.path.basename(path),
                            g,
                            len(vals),
                            float(vals.min()) if len(vals) else None,
                            float(vals.max()) if len(vals) else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group", "num_rows", "stat_min", "stat_max"],
            )

    return files_df.mapInPandas(read_groups, ROWGROUP_SCHEMA)
