"""Feed ingestion — the engine's ``COPY INTO`` (reference
``ingest-dag.sql`` tasks / ``ingest-backfill.sql`` one-shots; they are
the same statement, idempotent through the load ledger).

Schema-on-read: the declared feed schema is projected onto whatever
the parquet files contain — present columns are cast, missing columns
become typed NULLs (the ``$1:field::TYPE`` idiom nulls missing paths,
SURVEY §1.3). Path-derived yyyy/mm/dd/metadata_date override any
same-named file columns, exactly like the ingest SELECTs.

The raw table is written partitioned by yyyy/mm/dd, mirroring the S3
layout so watermark predicates prune partitions downstream (BASELINE
intent: "read only new data per run").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from .ledger import LoadLedger
from .stage import discover_feed, read_stage_files

FEED_SCHEMAS: dict[str, T.StructType] = {
    "ACR": schemas.ACR,
    "STB": schemas.STB,
    "GEO_WEIGHTS": schemas.GEO_WEIGHTS,
}

# columns derived from the file path, not the file contents
_PATH_COLUMNS = {"yyyy", "mm", "dd", "metadata_date"}


def project_declared_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast present columns / NULL missing ones, in declared order."""
    have = {c.lower() for c in df.columns}
    cols = []
    for field in schema.fields:
        if field.name.lower() in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_feed_table(spark: SparkSession, path: str, feed: str) -> DataFrame:
    """Read a raw feed table with its declared schema. The table is
    hive-partitioned by yyyy/mm/dd; supplying the schema pins the
    partition-column types (STB/GEO keep them as strings, ACR as ints
    — the reference's declared inconsistency, SURVEY §1.2) instead of
    letting partition type inference decide."""
    return (
        spark.read.schema(FEED_SCHEMAS[feed])
        .parquet(path)
        .select([f.name for f in FEED_SCHEMAS[feed].fields])
    )


@dataclass
class IngestResult:
    feed: str
    files_loaded: int
    rows_loaded: int


def ingest_feed(
    spark: SparkSession,
    stage_base: str,
    feed: str,
    target_path: str,
    ledger_path: str,
    subdir: str = "",
) -> IngestResult:
    """One COPY-INTO run: discover -> minus ledger -> transform ->
    append -> ledger. Re-running with no new files is a no-op."""
    ledger = LoadLedger(spark, ledger_path)
    discovered = discover_feed(spark, stage_base, feed, subdir)
    new = ledger.new_files(feed, discovered)
    if not new:
        return IngestResult(feed, 0, 0)
    raw = read_stage_files(spark, new)
    # path-derived columns win over any same-named file columns
    projected = project_declared_schema(raw, FEED_SCHEMAS[feed])
    rows = projected.count()
    (
        projected.write.mode("append")
        .partitionBy("yyyy", "mm", "dd")
        .parquet(target_path)
    )
    ledger.record(feed, new)
    return IngestResult(feed, len(new), rows)
