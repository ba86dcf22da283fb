"""Text feed formats: CSV and JSON-lines readers for the stage layer.

The reference ingests parquet only (``ingest-dag.sql``'s COPY
pattern); real feeds also land as gzipped CSV/JSONL drops. These
readers keep the same discipline as ``stage.read_stage_files``:

- **explicit schema, never inference** — schema inference is an extra
  full pass over the data at 100 TB AND a correctness hazard (a
  column that happens to look numeric for a day silently changes
  type). Feeds are declared like tables (``schemas.py``).
- **PERMISSIVE with a retained corrupt-record column** — a bad row
  quarantines instead of killing the load (Snowflake's
  ``ON_ERROR = CONTINUE``); the caller filters/persists
  ``_corrupt_record`` to a reject table and the load ledger keeps
  the file replayable.
- splittability note: plain-text CSV/JSONL splits by line; ``.gz``
  files are one task each — at scale prefer many medium gz objects
  (the feed's natural drop size) or zstd/bzip2 for splittable
  compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

__all__ = ["CORRUPT_COL", "read_csv_feed", "read_jsonl_feed", "split_rejects"]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return schema.add(CORRUPT_COL, StringType(), True)


def read_csv_feed(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV feed with declared schema + quarantine column. Malformed
    rows surface with the raw line in ``_corrupt_record`` and NULLs
    elsewhere; well-formed rows have a NULL ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(paths)
    )


def read_jsonl_feed(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType,
) -> DataFrame:
    """JSON-lines feed with declared schema + quarantine column."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(paths)
    )


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects): clean rows with the quarantine column
    dropped; rejects as (raw, parsed) for the reject table — ``raw``
    is the original line, ``parsed`` the per-field partial parse.
    Callers persist rejects next to the load-ledger entry so a replay
    can reprocess them after a parser fix.

    Keeping ``parsed`` is also load-bearing: Spark refuses a query
    whose file scan references ONLY the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — with
    full pruning the parser wouldn't attempt the fields, so corrupt
    detection would be incomplete); projecting the data columns keeps
    the parse honest."""
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"),
        F.struct(*[F.col(c) for c in data_cols]).alias("parsed"),
    )
    return clean, rejects
