"""Schema-evolution reader: declared-DDL conformance over mixed-
version parquet directories."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from samba_tv_ingest_etl_spark.sources.evolution import (
    conform_to_schema,
    read_evolving_parquet,
)

DECLARED = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", LongType()),  # added in v2
    ]
)


def _write_versions(spark, base):
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    v1.write.parquet(os.path.join(base, "d"))
    v2 = spark.createDataFrame(
        [(3, "c", 30, "extra")],
        "id long, name string, score long, debug string",
    )
    v2.write.mode("append").parquet(os.path.join(base, "d"))
    return os.path.join(base, "d")


def test_old_files_null_fill_new_columns(spark, tmp_path):
    path = _write_versions(spark, str(tmp_path))
    df = read_evolving_parquet(spark, path, DECLARED)
    assert df.columns == ["id", "name", "score"]  # declared order, no extras
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}


def test_no_merge_path_skips_footer_sweep(spark, tmp_path):
    # merge=False: declared schema drives the scan directly — old
    # files still null-fill the columns they lack
    path = _write_versions(spark, str(tmp_path))
    df = read_evolving_parquet(spark, path, DECLARED, merge=False)
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows == {1: None, 2: None, 3: 30}


def test_conform_widens_types(spark):
    df = spark.createDataFrame([(1, "x", 5)], "id int, name string, score int")
    out = conform_to_schema(df, DECLARED)
    assert dict(out.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "bigint",
    }
    assert out.collect()[0]["score"] == 5
