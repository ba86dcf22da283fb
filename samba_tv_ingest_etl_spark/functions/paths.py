"""Hive-path partition extraction (reference ``ingest-dag.sql:6-28``).

The reference projects ``yyyy/mm/dd`` out of ``metadata$filename`` with
``regexp_replace`` capture groups, maps ``__HIVE_DEFAULT_PARTITION__``
to NULL via ``nullif``, and derives ``metadata_date`` with a
NULL-propagating concat + ``try_to_date``.

Faithfulness notes:
- Spark replacement backrefs are ``$1`` (Snowflake uses ``\\1``).
- When the regex does not match, both engines return the input string
  unchanged — so a hive-default path yields the *full path* in
  ``yyyy`` (not NULL; the nullif only catches a literal
  ``__HIVE_DEFAULT_PARTITION__`` value) and metadata_date goes NULL
  through the failed date parse. Preserved exactly.
- ``F.concat`` is NULL-propagating like Snowflake ``||``
  (``concat_ws`` would NOT be — SURVEY §2.8 F4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HIVE_DEFAULT = "__HIVE_DEFAULT_PARTITION__"

# file-selection regexes, verbatim semantics of the COPY INTO patterns
# (ingest-dag.sql:53,110,145). Note they require digit partitions, so
# hive-default partition files are never selected by ingest.
FEED_PATTERNS = {
    "STB": r"STB/yyyy=\d{4}/mm=\d{2}/dd=\d{2}/.*\.parquet$",
    "ACR": r"ACR/yyyy=\d{4}/mm=\d{2}/dd=\d{2}/.*\.parquet$",
    "GEO_WEIGHTS": r"Geo-Weights/yyyy=\d{4}/mm=\d{2}/dd=\d{2}/.*\.parquet$",
}


def extract_partition(path: Column, key: str, digits: int) -> Column:
    """``nullif(regexp_replace(path, '.*/key=(\\d{n})/.*', '$1'),
    '__HIVE_DEFAULT_PARTITION__')`` — ingest-dag.sql:7-13."""
    extracted = F.regexp_replace(
        path, rf".*\/{key}=(\d{{{digits}}})\/.*", "$1"
    )
    return F.nullif(extracted, F.lit(HIVE_DEFAULT))


def partition_columns(path: Column) -> dict[str, Column]:
    """The full yyyy/mm/dd/metadata_date derivation of the ingest
    SELECTs (ingest-dag.sql:7-28)."""
    yyyy = extract_partition(path, "yyyy", 4)
    mm = extract_partition(path, "mm", 2)
    dd = extract_partition(path, "dd", 2)
    metadata_date = F.try_to_date(
        F.concat(yyyy, F.lit("-"), mm, F.lit("-"), dd)
    )
    return {"yyyy": yyyy, "mm": mm, "dd": dd, "metadata_date": metadata_date}
