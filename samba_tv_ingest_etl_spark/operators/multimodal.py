"""Multimodal column plumbing (beyond-reference surface): opaque
``binary`` payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
STUB: ``decode_payload`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the payload bytes. Everything around the stub —
schema contract, Arrow batch shape, partition-preserving execution,
metadata projection — is real and tested: swapping the stub for
``PIL.Image.open``/``soundfile.read`` changes one function.

Scale notes: ``mapInPandas`` streams Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a partition of
large payloads never materializes at once; payload columns should be
stored in their own parquet column chunk (automatic) so metadata-only
queries never read the bytes (column pruning). Feature extraction is
embarrassingly parallel — no shuffle at all; repartition upstream by
size if payload skew starves executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.LongType())),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media table: UTF-8 bytes of the text as the opaque
    payload (JVM-side encode — no Python), media_type round-robin."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_payload(payload: bytes, media_type: str, fake: bool = False):
    """The codec boundary. Real decode needs PIL/soundfile/av — not in
    this container."""
    if not fake:
        raise NotImplementedError(
            f"no codec available for {media_type}; install the media "
            "libs and replace this stub"
        )
    # deterministic fake: FEATURE_DIM bucket-sums of the byte stream
    sums = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        sums[i % FEATURE_DIM] += b
    return sums


def extract_features(media: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``; emits
    FEATURES_SCHEMA rows, one per input row, preserving partitioning
    (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=True)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_sum": [sum(f) for f in feats],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
