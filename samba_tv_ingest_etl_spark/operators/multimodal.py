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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Image resize over ``mapInPandas`` — payload in, transformed
    payload out, 1:1 rows, no shuffle. Real path (``fake=False``,
    needs PIL): decode, resize to ``width``x``height``, re-encode
    PNG. Fake path: deterministic byte stride-sample to
    ``width*height`` bytes — same schema, same batch shape, same
    downstream contract, so swapping in the codec changes nothing
    but pixels. Non-image rows pass through untouched (a pipeline
    resizes what it can and preserves the rest)."""

    def _resize_one(payload: bytes, media_type: str) -> bytes:
        if media_type != "image":
            return payload
        if not fake:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload))
            buf = io.BytesIO()
            img.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
        target = width * height
        if len(payload) <= target:
            return payload
        stride = len(payload) / target
        return bytes(payload[int(i * stride)] for i in range(target))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _resize_one(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": [len(p) for p in out],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Video frame sampling over ``mapInPandas`` — the 1:N fan-out
    shape (one row in, ``n_frames`` rows out) that a real
    ``av``-based sampler uses; non-video rows are dropped. Real
    decode needs a container/codec lib that is not in this
    environment, so ``fake=False`` raises ``NotImplementedError``
    at the same boundary as ``decode_payload``; the fake path
    splits the payload into ``n_frames`` contiguous byte segments
    (deterministic, schema-identical).

    Scale: fan-out multiplies rows, not bytes-per-row; Arrow batch
    streaming keeps peak memory at one input batch + its frames.
    Downstream per-frame feature extraction stays shuffle-free."""
    if not fake:
        raise NotImplementedError(
            "no video container codec available; install av and route "
            "through decode_payload's codec registry"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for d, p, m in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if m != "video" or len(p) == 0:
                    continue
                step = max(1, len(p) // n_frames)
                for k in range(min(n_frames, len(p))):
                    ids.append(d)
                    idxs.append(k)
                    frames.append(bytes(p[k * step:(k + 1) * step]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
