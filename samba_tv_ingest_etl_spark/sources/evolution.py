"""Schema evolution: read a table whose parquet files span schema
versions, conformed to the DECLARED schema.

Feeds evolve — a column appears in March, another is dropped in
June — but the warehouse contract is the declared DDL
(``schemas.py``), not whatever the newest file happens to contain.
``read_evolving_parquet`` reads with ``mergeSchema`` (the union of
all file schemas, so old files null-fill newer columns) and then
``conform_to_schema`` projects that union onto the declaration:
missing columns materialize as typed NULLs, extra columns drop,
matching columns cast to the declared type (safe widening like
int -> long; lossy narrowing is the caller's deliberate choice).

Scale note: ``mergeSchema`` does a driver-side footer read of every
file at planning — on a huge table pin the schema instead (pass
``merge=False``): conformance then never touches file footers and
each file still null-fills the declared columns it lacks, provided
the declared schema is a superset of the live files'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["conform_to_schema", "read_evolving_parquet"]


def conform_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: declared order, declared
    types, NULL-fill for absent columns, extras dropped."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        if field.name in have:
            cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
    return df.select(*cols)


def read_evolving_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType,
    merge: bool = True,
) -> DataFrame:
    """Read a multi-version parquet directory conformed to the
    declared ``schema``. ``merge=True`` unions file schemas first
    (needed when some declared column exists only in SOME files);
    ``merge=False`` skips the footer sweep and reads strictly what
    the declaration names."""
    if merge:
        raw = spark.read.option("mergeSchema", "true").parquet(path)
    else:
        raw = spark.read.schema(schema).parquet(path)
    return conform_to_schema(raw, schema)
