"""Text feed readers: declared schema, PERMISSIVE quarantine."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from samba_tv_ingest_etl_spark.sources.formats import (
    CORRUPT_COL,
    read_csv_feed,
    read_jsonl_feed,
    split_rejects,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("n", LongType()),
    ]
)


def test_csv_quarantines_malformed_rows(spark, tmp_path):
    p = os.path.join(str(tmp_path), "feed.csv")
    with open(p, "w") as f:
        f.write("id,name,n\n")
        f.write("1,alpha,10\n")
        f.write("2,beta,not_a_number\n")  # type error -> quarantine
        f.write("3,gamma,30\n")
    clean, rejects = split_rejects(read_csv_feed(spark, p, SCHEMA))
    assert sorted((r["id"], r["n"]) for r in clean.collect()) == [
        (1, 10),
        (3, 30),
    ]
    rej = [r["raw"] for r in rejects.collect()]
    assert rej == ["2,beta,not_a_number"]


def test_jsonl_quarantines_malformed_rows(spark, tmp_path):
    p = os.path.join(str(tmp_path), "feed.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha", "n": 10}\n')
        f.write("this is not json\n")
        f.write('{"id": 3, "name": "gamma", "n": 30}\n')
    clean, rejects = split_rejects(read_jsonl_feed(spark, p, SCHEMA))
    assert sorted((r["id"], r["n"]) for r in clean.collect()) == [
        (1, 10),
        (3, 30),
    ]
    rej = [r["raw"] for r in rejects.collect()]
    assert rej == ["this is not json"]


def test_missing_fields_are_null_not_corrupt(spark, tmp_path):
    # a VALID row with a missing optional field parses with NULL —
    # quarantine is for unparseable rows, not sparse ones
    p = os.path.join(str(tmp_path), "sparse.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alpha"}\n')
    df = read_jsonl_feed(spark, p, SCHEMA)
    row = df.collect()[0]
    assert row["id"] == 1 and row["n"] is None
    assert row[CORRUPT_COL] is None
