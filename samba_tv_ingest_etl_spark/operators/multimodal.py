"""Multimodal column plumbing (beyond-reference surface): opaque
``binary`` payloads + typed metadata, processed with Arrow-batched
``mapInPandas``.

The decode step tries real codecs first: ``decode_payload`` with
``fake=False`` dispatches to PIL (image) / soundfile (audio) when
those libraries import (``available_codecs``), and otherwise falls
back to the vendored pure-Python decoders (``_png_decode_gray``:
zlib + per-row filter reconstruction for 8-bit grayscale PNG;
``_wav_decode``: struct-parsed PCM_16 WAV) so the real-codec path is
exercised in EVERY environment. Only media types with no decoder at
all (video) raise ``NotImplementedError``. The deterministic fake
(``fake=True``), which derives a feature vector from the raw payload
bytes, remains the default for pipelines whose payloads are not
actually decodable media (q30/q65 attach text bytes). Everything
around the codec boundary — schema contract, Arrow batch shape,
partition-preserving execution, metadata projection — is identical
for all paths.

Heterogeneity caveat, stated — and controllable: features are
deterministic for a given DECODER (the library path may resample
differently from the pure fallback on non-trivial images), so a
mixed fleet — PIL on some workers, fallback on others — could emit
inconsistent features for the same payload UNDER ``codec='auto'``.
The codec is an explicit parameter everywhere (``codec_registry``):
fleet configs pin ``codec='pure'`` (identical everywhere, libraries
or not) or ``codec='lib'`` (library semantics, loud ImportError on a
worker missing it) — auto-dispatch is the opt-in convenience, and
``codec_name(media_type)`` reports which decoder auto would pick so
provenance can be emitted next to features.

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


# PNG color types the pure decoder accepts, with bytes-per-pixel
_PNG_BPP = {0: 1, 2: 3, 3: 1}  # grayscale, RGB, palette-indexed


def _png_decode_gray(payload: bytes) -> tuple[int, int, list[bytearray]]:
    """Vendored pure-Python PNG decoder for the profiles the codec
    seam consumes: 8-bit grayscale (color type 0), 8-bit RGB (2) and
    8-bit palette (3), non-interlaced. RGB/palette pixels reduce to
    grayscale with the deterministic integer ITU-R 601 luma
    ``(299·R + 587·G + 114·B) // 1000`` (floor — stated so the
    contract is pinned; PIL's ``convert("L")`` rounds differently, a
    divergence covered by the module's heterogeneity caveat). Full
    spec conformance where it matters for correctness: multi-IDAT
    streams and all five per-row filter types (None/Sub/Up/Average/
    Paeth) are reconstructed exactly AT THE PIXEL'S byte stride —
    a PNG is not just "zlib of pixels". Unsupported profiles
    (16-bit, alpha, interlaced) raise ``NotImplementedError`` loudly:
    a mixed corpus can never silently mis-decode. Returns
    ``(width, height, rows)`` of grayscale bytes."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad magic")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_BPP:
        raise NotImplementedError(
            "pure-Python PNG fallback handles 8-bit non-interlaced "
            "grayscale/RGB/palette (color types 0/2/3) only, got "
            f"depth={depth} color={ctype} interlace={interlace}; "
            "install PIL for full decode"
        )
    if ctype == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG: missing or malformed PLTE")
    bpp = _PNG_BPP[ctype]
    stride = width * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:  # Sub (left neighbor = one pixel back)
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = line
        if ctype == 2:  # RGB -> integer luma
            line = bytearray(
                (299 * line[3 * x] + 587 * line[3 * x + 1]
                 + 114 * line[3 * x + 2]) // 1000
                for x in range(width)
            )
        elif ctype == 3:  # palette index -> RGB -> integer luma
            line = bytearray(
                (299 * plte[3 * i] + 587 * plte[3 * i + 1]
                 + 114 * plte[3 * i + 2]) // 1000
                for i in line
            )
        rows.append(line)
    return width, height, rows


def _png_encode_gray(rows: list[bytearray]) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 rows, one IDAT)
    — the write half of the pure fallback codec."""
    import struct
    import zlib

    height, width = len(rows), len(rows[0])

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _resize_gray_nearest(
    rows: list[bytearray], width: int, height: int, out_w: int, out_h: int
) -> list[bytearray]:
    """Pixel-center nearest-neighbor resample (the ``(i+0.5)*scale``
    source rule) — the pure fallback's resize kernel."""
    return [
        bytearray(
            rows[min(height - 1, int((j + 0.5) * height / out_h))][
                min(width - 1, int((i + 0.5) * width / out_w))
            ]
            for i in range(out_w)
        )
        for j in range(out_h)
    ]


def _image_features_pure(payload: bytes) -> list[int]:
    """Pure-Python image path: decode grayscale PNG, nearest-neighbor
    resize to FEATURE_DIM x FEATURE_DIM, integer row sums. Same
    contract as ``_image_features``; may differ from PIL on
    non-uniform images (resample kernel), identical on the uniform
    profile — see the module docstring's heterogeneity caveat."""
    w, h, rows = _png_decode_gray(payload)
    small = _resize_gray_nearest(rows, w, h, FEATURE_DIM, FEATURE_DIM)
    return [int(sum(r)) for r in small]


def _wav_decode(payload: bytes) -> list[int]:
    """Vendored pure-Python WAV decoder: walk RIFF chunks (not a
    fixed-offset slice — fmt/data may come after LIST etc.), require
    PCM_16, return per-frame sum of |sample| across channels — the
    exact ``np.abs(data).sum(axis=1)`` the soundfile path computes."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    audio_format, n_channels, _sr, _br, _ba, bits = fmt
    if (audio_format, bits) != (1, 16):
        raise NotImplementedError(
            "pure-Python WAV fallback handles PCM_16 only, got "
            f"format={audio_format} bits={bits}; install soundfile"
        )
    n = len(data) // (2 * n_channels) * n_channels
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    return [
        sum(abs(s) for s in samples[f:f + n_channels])
        for f in range(0, n, n_channels)
    ]


def _audio_features_pure(payload: bytes) -> list[int]:
    """Pure-Python audio path: same abs-amplitude bucket sums as
    ``_audio_features``, bit-identical to the soundfile path for
    PCM_16 input (integer arithmetic end to end)."""
    mono = _wav_decode(payload)
    out = [0] * FEATURE_DIM
    for k in range(FEATURE_DIM):
        out[k] = sum(mono[k::FEATURE_DIM])
    return out


_LIB_CODECS = {"image": _image_features, "audio": _audio_features}
_PURE_CODECS = {
    "image": _image_features_pure,
    "audio": _audio_features_pure,
}
_LIB_NAMES = {"image": "PIL", "audio": "soundfile"}


@_lru_cache(maxsize=1)
def available_codecs() -> dict:
    """Media types with a real decoder under AUTO dispatch: the
    library path (PIL / soundfile) when it imports, else the vendored
    pure-Python fallback — so image/audio ALWAYS decode and only
    video lacks a codec. Evaluated once per Python worker — the
    import probe never runs per row."""
    codecs = dict(_PURE_CODECS)
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


def codec_registry(codec: str = "auto") -> dict:
    """The EXPLICIT codec selector (determinism contract):

    - ``"pure"``  — always the vendored pure-Python decoders: the
      same bytes give the same features on every machine, libraries
      installed or not. Fleet configs that need cross-worker
      determinism pin this.
    - ``"lib"``   — always the library decoders (PIL / soundfile);
      a worker missing the library fails LOUDLY at decode time
      (ImportError) instead of silently switching resample kernels.
    - ``"auto"``  — best-available dispatch (library, else pure);
      convenient, but feature values may differ between environments
      — see the module docstring's heterogeneity caveat. Pair with
      ``codec_name`` when provenance must be recorded.
    """
    if codec == "pure":
        return _PURE_CODECS
    if codec == "lib":
        return _LIB_CODECS
    if codec == "auto":
        return available_codecs()
    raise ValueError(f"codec must be 'auto', 'lib' or 'pure': {codec!r}")


def codec_name(media_type: str, codec: str = "auto") -> str:
    """Which decoder ``decode_payload`` would run for this media type
    — ``'PIL'`` / ``'soundfile'`` / ``'pure'`` / ``'none'``. Emit it
    alongside features when using ``codec='auto'`` so environment-
    dependent divergence is detectable in the output."""
    fn = codec_registry(codec).get(media_type)
    if fn is None:
        return "none"
    return "pure" if fn in _PURE_CODECS.values() else _LIB_NAMES[media_type]


def decode_payload(
    payload: bytes, media_type: str, fake: bool = False,
    codec: str = "auto",
):
    """The codec boundary: real decoders per the explicit ``codec``
    selector (``codec_registry``), the deterministic fake on demand,
    NotImplementedError otherwise (no silent wrong answers for
    undecodable media)."""
    if not fake:
        fn = codec_registry(codec).get(media_type)
        if fn is None:
            raise NotImplementedError(
                f"no codec available for {media_type}; install the "
                "media libs (PIL for image, soundfile for audio)"
            )
        return fn(payload)
    # deterministic fake: FEATURE_DIM bucket-sums of the byte stream
    sums = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        sums[i % FEATURE_DIM] += b
    return sums


def extract_features(
    media: DataFrame,
    batch_size_hint: int | None = None,
    fake: bool = True,
    codec: str = "auto",
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``; emits
    FEATURES_SCHEMA rows, one per input row, preserving partitioning
    (no shuffle). ``fake=False`` routes each row through the real
    codec for its media type, selected by the explicit ``codec``
    parameter (``codec_registry``: pin ``'pure'``/``'lib'`` for
    cross-environment determinism; ``'auto'`` = best available)."""
    if codec not in ("auto", "lib", "pure"):  # fail on the driver,
        raise ValueError(f"bad codec {codec!r}")  # not per executor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(p, m, fake=fake, codec=codec)
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
    media: DataFrame, width: int = 32, height: int = 32,
    fake: bool = True, codec: str = "auto",
) -> DataFrame:
    """Image resize over ``mapInPandas`` — payload in, transformed
    payload out, 1:1 rows, no shuffle. Real path (``fake=False``):
    decode, resize to ``width``x``height``, re-encode PNG — decoder
    selected by the explicit ``codec`` parameter: ``'lib'`` = PIL
    (loud ImportError where missing), ``'pure'`` = the vendored
    grayscale pipeline (``_png_decode_gray`` + nearest-neighbor +
    ``_png_encode_gray``), ``'auto'`` = PIL when it imports, else
    pure. Fake path: deterministic byte stride-sample to
    ``width*height`` bytes — same schema, same batch shape, same
    downstream contract, so swapping in the codec changes nothing but
    pixels. Non-image rows pass through untouched (a pipeline resizes
    what it can and preserves the rest)."""
    if codec not in ("auto", "lib", "pure"):
        raise ValueError(f"bad codec {codec!r}")

    def _resize_one(payload: bytes, media_type: str) -> bytes:
        if media_type != "image":
            return payload
        if not fake:
            use_pil = codec != "pure"
            if use_pil:
                try:
                    import io

                    from PIL import Image
                except ImportError:
                    if codec == "lib":
                        raise  # explicit lib pin: fail loudly
                    use_pil = False
            if not use_pil:
                w, h, rows = _png_decode_gray(payload)
                return _png_encode_gray(
                    _resize_gray_nearest(rows, w, h, width, height)
                )
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
