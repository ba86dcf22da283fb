"""Load ledger — the engine's replacement for Snowflake COPY load
history (file-level exactly-once, SURVEY §2.1-S5 / §4.2-3).

A parquet table of already-ingested file paths per feed. Ingest =
discovered files MINUS ledger -> read -> append -> ledger append.
The ledger row is written only after the data append commits, so a
crash re-runs the file (append of the same file twice is prevented by
re-checking the ledger first — the COPY idempotency contract that
makes the daily task and the backfill the same statement).

Scale: the ledger is a path-keyed metadata table (millions of rows at
most), read driver-side as a set; at true fleet scale swap the set
for a broadcast anti-join on the file list DataFrame.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import schemas


class LoadLedger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        sc = self.spark.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))

    def seen(self, feed: str) -> set[str]:
        if not self._exists():
            return set()
        df = self.spark.read.schema(schemas.LOAD_LEDGER).parquet(self.path)
        return {
            r["file_path"]
            for r in df.filter(F.col("feed") == feed).select("file_path").collect()
        }

    def new_files(self, feed: str, discovered: list[str]) -> list[str]:
        seen = self.seen(feed)
        return [f for f in discovered if f not in seen]

    def record(self, feed: str, files: list[str]) -> None:
        if not files:
            return
        # JVM-born rows (range+explode over literals) instead of a
        # Python-local relation: createDataFrame(...).coalesce(1)
        # drains every pickled partition through the Python runner at
        # ~4-5 s per write action (measured, r12); the literal form
        # writes in ~0.1 s. Fallback past 1024 files keeps the
        # generated expression bounded (the ISIN_LITERAL_CAP class).
        if len(files) <= 1024:
            df = self.spark.range(1).select(
                F.explode(
                    F.array(*[F.lit(f) for f in files])
                ).alias("file_path"),
                F.lit(feed).alias("feed"),
                F.current_timestamp().alias("loaded_at"),
            ).coalesce(1)
        else:
            df = self.spark.createDataFrame(
                [(f, feed) for f in files], ["file_path", "feed"]
            ).withColumn("loaded_at", F.current_timestamp()).coalesce(1)
        df.write.mode("append").parquet(self.path)
