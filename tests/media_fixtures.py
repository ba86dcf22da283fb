"""Vendored media fixtures, written byte-by-byte in pure Python.

The real-codec tests previously ENCODED their fixtures with the same
library whose DECODE path they were testing (PIL round-trip,
soundfile round-trip) — a self-consistency check that can't catch an
encoder/decoder assumption mismatch and that skips entirely when the
library is missing. These generators produce spec-conformant PNG/WAV
bytes with no third-party imports, so:

- fixture bytes exist (and are structurally asserted) in EVERY
  environment, including this container without PIL/soundfile;
- where the decoders are installed, they decode independently-encoded
  files, not their own output.

Formats intentionally minimal: 8-bit grayscale PNG (color type 0,
filter 0 rows, one IDAT) and PCM_16 mono WAV — exactly what
``operators/multimodal.py``'s codec seam consumes.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
WAV_MAGIC = b"RIFF"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def tiny_png(width: int = 4, height: int = 4, gray: int = 7) -> bytes:
    """Uniform 8-bit grayscale PNG: every pixel = ``gray``."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def tiny_wav(samples: list[int], sample_rate: int = 16000) -> bytes:
    """PCM_16 mono WAV with the given int16 samples."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body
