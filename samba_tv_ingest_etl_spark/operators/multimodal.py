"""Multimodal column plumbing (beyond-reference surface): opaque
``binary`` payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

The decode step tries real codecs first: ``decode_payload`` with
``fake=False`` dispatches to PIL (image) / soundfile (audio) when
those libraries import (``available_codecs``), and raises
``NotImplementedError`` only for media types with no importable
codec — in this container that is all of them, so the default test
path stays the deterministic fake (``fake=True``), which derives a
feature vector from the payload bytes. Everything around the codec
boundary — schema contract, Arrow batch shape, partition-preserving
execution, metadata projection — is identical for both paths.

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
from functools import lru_cache as _lru_cache

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


def _image_features(payload: bytes) -> list[int]:
    """PIL path: grayscale, resize to FEATURE_DIM x FEATURE_DIM,
    integer row sums — deterministic for a given decoder version."""
    import io

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    img = img.resize((FEATURE_DIM, FEATURE_DIM))
    return [int(v) for v in np.asarray(img, dtype="int64").sum(axis=1)]


def _audio_features(payload: bytes) -> list[int]:
    """soundfile path: int16 PCM, abs-amplitude bucket sums (same
    bucketing rule as the fake path, over samples instead of bytes)."""
    import io

    import numpy as np
    import soundfile as sf

    data, _sr = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
    mono = np.abs(data.astype("int64")).sum(axis=1)
    out = [0] * FEATURE_DIM
    for k in range(FEATURE_DIM):
        out[k] = int(mono[k::FEATURE_DIM].sum())
    return out


@_lru_cache(maxsize=1)
def available_codecs() -> dict:
    """Media types with an importable real decoder. Evaluated once per
    Python worker — the import probe never runs per row."""
    codecs = {}
    try:
        import PIL.Image  # noqa: F401

        codecs["image"] = _image_features
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401

        codecs["audio"] = _audio_features
    except ImportError:
        pass
    return codecs


def decode_payload(payload: bytes, media_type: str, fake: bool = False):
    """The codec boundary: real decoders when their libraries import,
    the deterministic fake on demand, NotImplementedError otherwise
    (no silent wrong answers for undecodable media)."""
    if not fake:
        codec = available_codecs().get(media_type)
        if codec is None:
            raise NotImplementedError(
                f"no codec available for {media_type}; install the "
                "media libs (PIL for image, soundfile for audio)"
            )
        return codec(payload)
    # deterministic fake: FEATURE_DIM bucket-sums of the byte stream
    sums = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        sums[i % FEATURE_DIM] += b
    return sums


def extract_features(
    media: DataFrame,
    batch_size_hint: int | None = None,
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``; emits
    FEATURES_SCHEMA rows, one per input row, preserving partitioning
    (no shuffle). ``fake=False`` routes each row through the real
    codec for its media type (``available_codecs``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=fake)
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
