"""Exactly-once streaming sink: foreachBatch + batch-id ledger.

Structured Streaming's parquet sink is at-least-once across sink
restarts with a reused checkpoint only because the sink keeps its own
file manifest; writing to an EXTERNAL table (or any side effect —
MERGE into a warehouse, JDBC, object-store copy) through
``foreachBatch`` is at-least-once by default: after a crash between
"batch written" and "offsets committed", the restarted query replays
the batch. The standard fix is transactional idempotence keyed on
``batchId`` — the micro-batch twin of the file-level load ledger
(``sources/ledger.py``): skip any batch id the ledger already has,
record the id only after the write commits.

The write itself appends to a hive-partitioned directory keyed by
``_batch_id``, so a replayed half-written batch is also physically
replaced (dynamic partition overwrite of that one batch partition) —
idempotence holds even when the crash hit mid-append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ExactlyOnceForeachBatch"]


class ExactlyOnceForeachBatch:
    """``writeStream.foreachBatch(ExactlyOnceForeachBatch(path))``:
    idempotent per-batch parquet append. Batch ids live as hive
    partition values under the output path itself — no extra state
    store: the data directory IS the ledger (listing
    ``_batch_id=N`` directories answers "seen?"), so the dedup
    decision and the data can never disagree."""

    def __init__(self, path: str):
        self.path = path

    def _seen(self, spark, batch_id: int) -> bool:
        sc = spark.sparkContext
        jvm = sc._jvm
        sub = jvm.org.apache.hadoop.fs.Path(
            self.path.rstrip("/") + f"/_batch_id={batch_id}"
        )
        fs = sub.getFileSystem(sc._jsc.hadoopConfiguration())
        if not fs.exists(sub):
            return False
        # a batch dir without _COMMITTED is a half-written replay
        # victim: overwrite it
        return bool(
            fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    sub.toString() + "/_COMMITTED"
                )
            )
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self._seen(spark, batch_id):
            return  # replayed batch: already durably committed
        out = batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "dynamic")
        try:
            # dynamic overwrite replaces ONLY this batch's partition:
            # a half-written previous attempt is replaced, sibling
            # batches untouched
            out.write.mode("overwrite").partitionBy("_batch_id").parquet(
                self.path
            )
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        sc = spark.sparkContext
        jvm = sc._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            self.path.rstrip("/") + f"/_batch_id={batch_id}/_COMMITTED"
        )
        fs = marker.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.create(marker, True).close()
