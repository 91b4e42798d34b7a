"""JSONL (newline-delimited JSON) ingestion: the landing format of raw
text corpora (Common Crawl derivatives, API exports, labeling tools ship
JSONL long before anything becomes parquet).

The 100 TB concerns this module encodes:

- **Explicit schema, never inference.**  Schema inference reads the data
  TWICE (one full pass just to guess types) and silently unions drifting
  shapes; at corpus scale both are unacceptable.  Callers pass the
  contract; the reader enforces it.
- **Corrupt records are data, not exceptions.**  A million-file crawl WILL
  contain truncated lines, stray BOMs, invalid UTF-8 escapes.  PERMISSIVE
  mode lands them in a quarantine column instead of failing the job
  (FAILFAST is for unit tests, DROPMALFORMED silently loses evidence);
  ``split_corrupt`` separates clean rows from the quarantine for triage.
- **Line-splittable.**  JSONL (unlike a JSON array) splits on newlines, so
  a 1 GB file parallelizes across tasks like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL with an explicit contract; malformed lines survive in
    ``_corrupt_record`` (PERMISSIVE).  The quarantine column is appended to
    the caller's schema — do not include it yourself."""
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the quarantine column dropped,
    and the raw text of every malformed line for triage.

    Spark only materializes ``_corrupt_record`` when the row failed to
    parse, but a PERMISSIVE row can also be half-parsed (some fields null,
    corrupt text retained) — the quarantine keeps the ORIGINAL line either
    way, which is what a repair job needs.

    The parsed frame is persisted first: Spark refuses corrupt-column-only
    queries against the raw source (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN — the column exists only as a parse side-effect),
    and the persist also means clean+quarantine together cost ONE parse of
    the input, not two.  The persist is LIBRARY-owned via ``owned_persist``
    (ADVICE r8): a long-lived session frees it with
    ``hnsw_spark.release_caches()`` instead of accumulating it forever."""
    from hnsw_spark.plans.cachereg import owned_persist

    df = owned_persist(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
