"""Exactly-once streaming sink: foreachBatch + batch-id ledger.

Structured Streaming's parquet sink is at-least-once across sink
restarts with a reused checkpoint only because the sink keeps its own
file manifest; writing to an EXTERNAL table (or any side effect —
MERGE into a warehouse, JDBC, object-store copy) through
``foreachBatch`` is at-least-once by default: after a crash between
"batch written" and "offsets committed", the restarted query replays
the batch. The standard fix is transactional idempotence keyed on
``(application id, batchId)`` — the micro-batch twin of the
file-level load ledger (``sources/ledger.py``), and the same shape as
Delta Lake's ``txnAppId``/``txnVersion`` idempotent-writer contract:
skip any (app, batch) the ledger already has, record it only after
the write commits.

Why the app id is part of the key: ``batchId`` restarts from 0 for
every fresh checkpoint, so a ledger keyed on ``batchId`` alone would
silently drop batch 0..N of any *new* query pointed at an output path
some earlier query had already written. Callers that intentionally
replay the same logical pipeline (checkpoint reset, backfill rerun)
pass the same ``app_id`` and get dedup; a genuinely different
pipeline passes its own ``app_id`` and its batches land untouched.

The write itself appends to a hive-partitioned directory keyed by
``(_txn_app_id, _batch_id)``, so a replayed half-written batch is
also physically replaced (dynamic partition overwrite of that one
batch partition) — idempotence holds even when the crash hit
mid-append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ExactlyOnceForeachBatch"]


class ExactlyOnceForeachBatch:
    """``writeStream.foreachBatch(ExactlyOnceForeachBatch(path, app_id))``:
    idempotent per-batch parquet append. (app, batch) ids live as hive
    partition values under the output path itself — no extra state
    store: the data directory IS the ledger (listing
    ``_txn_app_id=A/_batch_id=N`` directories answers "seen?"), so the
    dedup decision and the data can never disagree.

    ``app_id`` is the stable logical-pipeline identity (Delta's
    ``txnAppId``): reuse it across checkpoint resets of the *same*
    pipeline; give each distinct pipeline writing to a shared path its
    own value.
    """

    def __init__(self, path: str, app_id: str = "default"):
        if "/" in app_id or "=" in app_id:
            raise ValueError(
                f"app_id {app_id!r} must be a plain partition-safe token"
            )
        self.path = path
        self.app_id = app_id

    def _batch_dir(self, batch_id: int) -> str:
        return (
            self.path.rstrip("/")
            + f"/_txn_app_id={self.app_id}/_batch_id={batch_id}"
        )

    def seen(self, spark, batch_id: int) -> bool:
        """True iff ``(app_id, batch_id)`` is durably committed —
        public so composite handlers (e.g. streaming dedup against
        the band index) can skip ALL their side effects on a
        replayed batch, not just the final write."""
        return self._seen(spark, batch_id)

    def _seen(self, spark, batch_id: int) -> bool:
        sc = spark.sparkContext
        jvm = sc._jvm
        sub = jvm.org.apache.hadoop.fs.Path(self._batch_dir(batch_id))
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
        out = batch_df.withColumn(
            "_txn_app_id", F.lit(self.app_id)
        ).withColumn("_batch_id", F.lit(int(batch_id)))
        # per-write option (not session conf): dynamic overwrite
        # replaces ONLY this batch's partition — a half-written
        # previous attempt is replaced, sibling batches and other
        # apps' partitions untouched — without flipping a
        # session-wide conf that concurrent writers could observe
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_txn_app_id", "_batch_id")
            .parquet(self.path)
        )
        sc = spark.sparkContext
        jvm = sc._jvm
        marker = jvm.org.apache.hadoop.fs.Path(
            self._batch_dir(batch_id) + "/_COMMITTED"
        )
        fs = marker.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.create(marker, True).close()
