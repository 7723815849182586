"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch shapes, UDF signatures)
is real and tested; the actual media decode is stubbed because codec
libraries are not available in this environment:

- ``decode_image(..., impl="fake")`` — deterministic fake decoder (metadata
  derived from a hash of the bytes) so pipelines are testable end-to-end.
- ``decode_image(..., impl="pillow")`` — raises ``NotImplementedError``
  unless Pillow is importable; the call path is the production shape.

Design for 100 TB of media: binary payloads never shuffle — decode/feature
stages are narrow ``mapInPandas`` transforms; only extracted features and
metadata (small) flow into joins/aggregations.  ``spark.read.format(
"binaryFile")`` provides ingestion; sampling N frames of video maps to
``posexplode(sequence(...))`` over frame indices *before* decode so the work
distributes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)


def media_schema(meta_fields: T.StructType = IMAGE_META_SCHEMA) -> T.StructType:
    """Canonical multimodal row: id + opaque payload + typed metadata."""
    return T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("content", T.BinaryType()),
            T.StructField("mime_type", T.StringType()),
            T.StructField("meta", meta_fields),
        ]
    )


def _fake_decode(content: bytes | None) -> tuple[int, int, str, str]:
    """Deterministic fake: dimensions derived from a digest of the payload —
    stable across runs/executors, no codec dependency."""
    if not content:
        return (0, 0, "NONE", "NONE")
    d = hashlib.sha256(content).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    mode = ["RGB", "RGBA", "L"][d[2] % 3]
    fmt = ["PNG", "JPEG", "WEBP"][d[3] % 3]
    return (width, height, mode, fmt)


def decode_image(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "fake",
) -> DataFrame:
    """content → (id, width, height, mode, format, n_bytes) via mapInPandas.

    The iterator-of-batches signature is the production shape: one Arrow
    batch in, one out, no per-row Python dispatch overhead beyond the decode
    itself.
    """
    if impl == "pillow":  # pragma: no cover - codec not in this environment
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "Pillow not available in this environment; use impl='fake' "
                "for plumbing tests"
            ) from e

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mode", T.StringType()),
            T.StructField("format", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "mode": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf[content_col]],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def resize_image(
    df: DataFrame,
    target_width: int,
    target_height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "fake",
) -> DataFrame:
    """content → (id, content, width, height) resized via mapInPandas.

    The fake impl passes payload bytes through and stamps the target
    dimensions (the real impl would re-encode); the Spark contract — binary
    in, binary out, narrow transform, payloads never shuffle — is identical.
    """
    if impl == "pillow":  # pragma: no cover - codec not in this environment
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "Pillow not available; use impl='fake' for plumbing tests"
            ) from e

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": pdf[content_col],
                    "width": [target_width if c is not None else 0 for c in pdf[content_col]],
                    "height": [target_height if c is not None else 0 for c in pdf[content_col]],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_resize, out_schema)


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "fake",
) -> DataFrame:
    """content → (id, sample_rate, n_channels, duration_s, codec, n_bytes).

    Same contract as :func:`decode_image` for the audio modality; the fake
    impl derives metadata deterministically from a payload digest.
    """
    if impl == "soundfile":  # pragma: no cover - codec not in this environment
        try:
            import soundfile  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "soundfile not available; use impl='fake' for plumbing tests"
            ) from e

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("codec", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def _meta(content: bytes | None) -> tuple[int, int, float, str]:
        if not content:
            return (0, 0, 0.0, "NONE")
        d = hashlib.sha256(content).digest()
        rate = [8000, 16000, 22050, 44100, 48000][d[0] % 5]
        channels = 1 + d[1] % 2
        duration = round(0.5 + (d[2] | (d[3] << 8)) / 65535.0 * 299.5, 3)
        codec = ["pcm_s16le", "flac", "opus"][d[4] % 3]
        return (rate, channels, duration, codec)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_meta(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [m[0] for m in metas],
                    "n_channels": [m[1] for m in metas],
                    "duration_s": [m[2] for m in metas],
                    "codec": [m[3] for m in metas],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf[content_col]],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices BEFORE decode so
    per-frame work distributes across tasks; the (stubbed) frame decode then
    runs per (media_id, frame_idx) row."""
    return df.select(
        F.col(id_col),
        F.col("content"),
        F.posexplode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_pos", "frame_idx"),
    ).drop("frame_pos")


def feature_extract(
    decoded: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Downstream feature stage over decoded metadata — pure JVM columnar ops
    (aspect ratio, size bucket), demonstrating that post-decode processing
    needs no Python."""
    return decoded.select(
        F.col(id_col),
        (F.col("width") / F.col("height")).alias("aspect_ratio"),
        F.when(F.col("width") * F.col("height") >= 128 * 128, "large")
        .otherwise("small")
        .alias("size_bucket"),
    )
