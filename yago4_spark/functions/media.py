"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads (or ``media_ref`` pointers) with typed metadata.

The image/audio decode libraries are NOT in this container, so the
decode kernels are STUBS behind import-tries — but everything Spark-side
is real and tested: schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning. ``deterministic_fake=True`` (default) swaps
the decode for a seeded md5-based fake so pipelines exercise the full
plumbing end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
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

FEATURE_DIM = 8


def _decode_real(media_ref: str) -> tuple[int, int, list[float]]:
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires pillow/ffmpeg, not present in this "
            "environment — run with deterministic_fake=True"
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
