"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads (or ``media_ref`` pointers) with typed metadata.

Two tiers:

- **Real decode kernels (std-only)** for formats decodable without
  pillow/ffmpeg: PPM/PGM images (``P6``/``P5`` — header + raw pixel
  bytes, parsed with numpy) and WAV PCM audio (stdlib ``wave``). These
  run Arrow-batched via ``mapInPandas`` and produce real
  width/height/duration plus a real 8-dim feature vector (channel/
  luminance statistics for images, RMS time-band energies for audio).
  ``synth_media_payload`` generates deterministic payloads in those
  formats from a ``media_ref`` (md5-seeded), so the encode→decode
  roundtrip is an end-to-end differential: the ``media_features``
  oracle query recomputes the expected metadata from the md5 formulas
  in SQL, and any header/parser bug breaks the match.
- **Stub tier** for formats the container genuinely cannot decode
  (JPEG/PNG/MP3 need pillow/ffmpeg): ``NotImplementedError`` behind an
  import-try, with ``deterministic_fake=True`` swapping in a seeded
  md5 fake so pipelines still exercise the full plumbing.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("media_ref", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

MEDIA_PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("media_ref", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

MEDIA_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("media_ref", StringType(), False),
        StructField("media_kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 8

# synth formula constants — mirrored byte-for-byte by the media_features
# oracle SQL (md5 hex → bytes h0,h1,h2 in DuckDB)
_IMG_DIM_BASE = 4
_IMG_DIM_MOD = 28
_WAV_RATE = 8000
_WAV_BASE_SAMPLES = 160   # +8*h1 keeps n divisible by 8 → integral ms


# --------------------------------------------------------------------------
# deterministic payload synthesis (PPM image / WAV audio from media_ref)
# --------------------------------------------------------------------------

def synth_media_payload(media_ref: str) -> bytes:
    """Deterministic REAL-format payload for a media_ref: even md5 lead
    byte → binary PPM (P6) image, odd → 16-bit mono PCM WAV. Dims and
    duration are md5-derived so an independent oracle can recompute
    them without decoding."""
    h = hashlib.md5(media_ref.encode("utf-8")).digest()
    if h[0] % 2 == 0:
        width = _IMG_DIM_BASE + h[1] % _IMG_DIM_MOD
        height = _IMG_DIM_BASE + h[2] % _IMG_DIM_MOD
        n = width * height * 3
        idx = np.arange(n, dtype=np.int64)
        pix = ((idx * (1 + h[3]) + h[4]) % 256).astype(np.uint8)
        return b"P6\n%d %d\n255\n" % (width, height) + pix.tobytes()
    n_samples = _WAV_BASE_SAMPLES + h[1] * 8
    idx = np.arange(n_samples, dtype=np.int64)
    samples = ((idx * (1 + h[2]) + 37 * h[3]) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# real decode kernels (std-only): PPM/PGM + WAV PCM
# --------------------------------------------------------------------------

def _parse_pnm_header(data: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, pixel_offset) for P5/P6; honors
    whitespace runs and '#' comments per the netpbm spec."""
    magic = data[:2]
    i, vals = 2, []
    while len(vals) < 3:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while data[j : j + 1] and not data[j : j + 1].isspace():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    return magic, vals[0], vals[1], vals[2], i + 1  # single ws after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, list[float]]:
    """Real P6/P5 decode: header parse + numpy over the raw pixel
    buffer. Features (8): per-channel mean/std + luminance mean/std,
    all /maxval, rounded to 6 (grayscale uses the one channel thrice)."""
    magic, width, height, maxval, off = _parse_pnm_header(payload)
    if magic == b"P6":
        arr = (
            np.frombuffer(payload, np.uint8, count=width * height * 3, offset=off)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    elif magic == b"P5":
        gray = (
            np.frombuffer(payload, np.uint8, count=width * height, offset=off)
            .reshape(height, width)
            .astype(np.float64)
        )
        r = g = b = gray
    else:
        raise NotImplementedError(f"unsupported PNM magic {magic!r}")
    lum = 0.299 * r + 0.587 * g + 0.114 * b
    feats = [
        r.mean(), g.mean(), b.mean(),
        r.std(), g.std(), b.std(),
        lum.mean(), lum.std(),
    ]
    return width, height, [round(float(f) / maxval, 6) for f in feats]


def decode_wav(payload: bytes) -> tuple[int, list[float]]:
    """Real WAV PCM decode via stdlib ``wave``: (duration_ms,
    8 RMS energy bands over time-eighths, /full-scale, rounded to 6).
    Multi-channel audio is averaged to mono before banding."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, n, ch, sw = (w.getframerate(), w.getnframes(),
                           w.getnchannels(), w.getsampwidth())
        raw = w.readframes(n)
    if sw != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {sw * 8}-bit")
    samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    duration_ms = round(1000 * n / rate)
    band_len = max(1, len(samples) // FEATURE_DIM)
    usable = samples[: band_len * FEATURE_DIM].reshape(FEATURE_DIM, band_len)
    feats = np.sqrt((usable**2).mean(axis=1))
    return duration_ms, [round(float(f), 6) for f in feats]


def decode_payload(payload: bytes) -> tuple[str, int | None, int | None,
                                            int | None, list[float]]:
    """Dispatch on magic bytes → (media_kind, width, height,
    duration_ms, features). Formats needing pillow/ffmpeg raise
    NotImplementedError (the honest stub boundary)."""
    head = bytes(payload[:4])
    if head[:2] in (b"P6", b"P5"):
        w, h, feats = decode_ppm(payload)
        return "image", w, h, None, feats
    if head == b"RIFF":
        dur, feats = decode_wav(payload)
        return "audio", None, None, dur, feats
    raise NotImplementedError(
        f"no std-only decoder for magic {head!r} (JPEG/PNG/MP3 need "
        "pillow/ffmpeg, absent in this environment)"
    )


# --------------------------------------------------------------------------
# Spark plumbing (Arrow-batched)
# --------------------------------------------------------------------------

def synth_media_payloads(media_spans: DataFrame) -> DataFrame:
    """(doc_id, span_idx, media_ref) → + payload binary via mapInPandas.
    Stands in for the 100 TB object-store fetch: the batch shape,
    schema, and partitioning are exactly what a real fetch kernel
    uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "span_idx": pdf["span_idx"].astype("int32"),
                    "media_ref": pdf["media_ref"],
                    "payload": [synth_media_payload(m) for m in pdf["media_ref"]],
                }
            )

    return media_spans.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, MEDIA_PAYLOAD_SCHEMA
    )


def decode_media_payloads(media_payloads: DataFrame) -> DataFrame:
    """MEDIA_PAYLOAD_SCHEMA → MEDIA_DECODED_SCHEMA with the REAL
    std-only kernels (PPM/PGM, WAV PCM). Arrow-batched; one decode per
    row inside the batch (the kernel is numpy-vectorized per payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_idx": pdf["span_idx"].astype("int32"),
                    "media_ref": pdf["media_ref"],
                    "media_kind": [d[0] for d in decoded],
                    "width": pd.array([d[1] for d in decoded], dtype="Int32"),
                    "height": pd.array([d[2] for d in decoded], dtype="Int32"),
                    "duration_ms": pd.array([d[3] for d in decoded],
                                            dtype="Int32"),
                    "features": [d[4] for d in decoded],
                }
            )

    return media_payloads.select(
        "doc_id", "span_idx", "media_ref", "payload"
    ).mapInPandas(run, MEDIA_DECODED_SCHEMA)


# --------------------------------------------------------------------------
# legacy ref-only path (fake features; kept for the plumbing contract)
# --------------------------------------------------------------------------

def _decode_real(media_ref: str) -> tuple[int, int, list[float]]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "ref-only decode of JPEG/PNG requires pillow, not present in "
            "this environment — use decode_media_payloads (PPM/WAV, real) "
            "or deterministic_fake=True"
        ) from e
    raise NotImplementedError("real decode path: fetch media_ref, decode, embed")


def _decode_fake(media_ref: str) -> tuple[int, int, list[float]]:
    """Seeded fake: md5(media_ref) drives dims + a unit-ish feature
    vector — bit-stable across runs and machines."""
    h = hashlib.md5(media_ref.encode("utf-8")).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [((h[2 + i] / 255.0) * 2 - 1) for i in range(FEATURE_DIM)]
    return width, height, feats


def decode_media_features(media_spans: DataFrame,
                          deterministic_fake: bool = True) -> DataFrame:
    """(doc_id, span_idx, media_ref) → MEDIA_FEATURES_SCHEMA via
    ``mapInPandas`` — Arrow-batched, one decode call per row INSIDE the
    batch (the kernel is C-level in a real deployment; the batch shape is
    what matters for Spark)."""
    decode = _decode_fake if deterministic_fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"].astype("int32"),
                "media_ref": pdf["media_ref"],
            }
            decoded = [decode(m) for m in pdf["media_ref"]]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["features"] = pd.Series([d[2] for d in decoded])
            yield pd.DataFrame(out)

    return media_spans.select("doc_id", "span_idx", "media_ref").mapInPandas(
        run, MEDIA_FEATURES_SCHEMA
    )
