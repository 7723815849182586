"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch shapes, UDF
signatures) is real and tested.  Three decode tiers:

- ``impl="builtin"`` — REAL metadata decode with no codec libraries:
  image container headers (PNG/JPEG/GIF/BMP/netpbm, parsed byte-by-byte
  from the public specs) and WAV audio via the stdlib ``wave`` reader;
  unrecognized formats yield null metadata.
- ``impl="fake"`` — deterministic fake decoder (metadata derived from a
  hash of the bytes) so pipelines are testable with arbitrary payloads.
- ``impl="pillow"`` / ``"soundfile"`` — the full-codec slots; raise
  ``NotImplementedError`` unless the library is importable (not in this
  environment); the call path is the production shape.

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


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
# SOF markers carrying frame dimensions (C4=DHT, C8=JPG, CC=DAC excluded)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _builtin_image_meta(b: bytes) -> tuple[int, int, str, str] | None:
    """REAL image metadata from the container headers — what a codec lib
    does for `.size` without decompressing pixel data.  Pure struct/byte
    parsing from the public format specs; returns None when the format
    isn't recognized (caller emits nulls)."""
    import struct

    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return (w, h, _PNG_MODES.get(b[25], "RGB"), "PNG")
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOF
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:  # legal fill byte(s) before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if marker in _JPEG_SOF and i + 9 <= len(b):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                ncomp = b[i + 9]
                return (w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, "RGB"), "JPEG")
            if marker in (0xD9, 0xDA):
                # SOS/EOI with no SOF seen: a valid JPEG always carries a
                # frame header before the scan — walking INTO the
                # entropy-coded data would read stuffed 0xFF bytes as
                # bogus segment lengths and could false-match a "SOF"
                # inside compressed data, returning garbage dimensions
                return None
            i += 2 + seglen
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return (w, h, "P", "GIF")
    if len(b) >= 26 and b[:2] == b"BM":
        # "BM" alone collides with plain text ("BMW to Make…" — the corpus's
        # testBMPfp.txt); require a real DIB header size at offset 14
        dib = struct.unpack("<I", b[14:18])[0]
        if dib in (12, 16, 40, 52, 56, 64, 108, 124):
            w, h = struct.unpack("<ii", b[18:26])
            if dib == 12:  # BITMAPCOREHEADER: UNSIGNED 16-bit width/height
                w, h = struct.unpack("<HH", b[18:22])
            return (w, abs(h), "RGB", "BMP")
        return None
    if len(b) >= 2 and b[:1] == b"P" and b[1:2] in b"1234567":  # netpbm
        try:
            fields: list[bytes] = []
            i = 2
            while len(fields) < 2 and i < len(b):
                c = b[i : i + 1]
                if c == b"#":
                    while i < len(b) and b[i : i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                else:
                    start = i
                    while i < len(b) and not b[i : i + 1].isspace():
                        i += 1
                    fields.append(b[start:i])
            w, h = int(fields[0]), int(fields[1])
            kind = b[1:2]
            if kind in b"14":  # P1/P4: 1-bit bitmaps
                mode, fmt = "1", "PBM"
            elif kind in b"25":  # P2/P5: grayscale
                mode, fmt = "L", "PGM"
            else:  # P3/P6: color
                mode, fmt = "RGB", "PPM"
            return (w, h, mode, fmt)
        except (ValueError, IndexError):
            return None
    return None


def _builtin_audio_meta(b: bytes) -> tuple[int, int, float, str] | None:
    """REAL audio metadata: WAV/RIFF via the stdlib ``wave`` reader (sample
    rate, channels, exact duration, PCM codec name).  None for formats that
    need external codec libs."""
    import io
    import wave

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            frames = w.getnframes()
            duration = round(frames / rate, 6) if rate else 0.0
            codec = f"pcm_s{8 * w.getsampwidth()}le"
            return (rate, channels, duration, codec)
    except (wave.Error, EOFError):
        return None


def _builtin_image_row(c) -> tuple:
    return (_builtin_image_meta(bytes(c)) if c is not None else None) or (
        None, None, None, None,
    )


def _fake_image_row(c) -> tuple:
    return _fake_decode(c)


def _pillow_image_row(c) -> tuple:
    """REAL full-codec decode via Pillow (when installed): ``Image.open`` is
    lazy — it parses the header for size/mode/format without decompressing
    pixel data, the same cost model as the builtin parser but covering
    every format Pillow knows.  Unreadable payloads → nulls."""
    import io

    from PIL import Image

    if not c:
        return (None, None, None, None)
    try:
        with Image.open(io.BytesIO(bytes(c))) as img:
            return (
                int(img.width),
                int(img.height),
                str(img.mode),
                str(img.format or "UNKNOWN"),
            )
    except Exception:
        return (None, None, None, None)


# impl -> row decoder.  Plan-time dispatch picks the function ONCE (a missing
# library raises NotImplementedError at plan time, never a silent fake
# fallthrough — r4 review finding), and the module-level functions pickle by
# reference into the Arrow workers.
IMAGE_DECODERS = {
    "builtin": _builtin_image_row,
    "fake": _fake_image_row,
    "pillow": _pillow_image_row,
}


def _require(impl: str, module: str) -> None:
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as e:
        raise NotImplementedError(
            f"{module} is not installed in this environment; impl={impl!r} "
            "needs it — use impl='builtin' (real header metadata, no codec "
            "libs) or impl='fake' (deterministic plumbing) instead"
        ) from e


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

    ``impl="builtin"`` parses REAL metadata from PNG/JPEG/GIF/BMP/netpbm
    headers (pure byte parsing, no codec libs; unknown formats → nulls);
    ``impl="fake"`` derives deterministic metadata from a digest (any
    payload, for plumbing tests); ``impl="pillow"`` is the REAL full-codec
    path (requires Pillow; raises NotImplementedError when absent).
    """
    if impl not in IMAGE_DECODERS:
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "pillow":
        _require(impl, "PIL")
    row_fn = IMAGE_DECODERS[impl]

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
            metas = [row_fn(c) for c in pdf[content_col]]
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


def _fake_resize_row(c, tw: int, th: int) -> tuple:
    """Passes payload bytes through and stamps the target dimensions — the
    plumbing-test impl (contract-identical shape, no codec)."""
    if c is None:
        return (None, 0, 0)
    return (bytes(c), tw, th)


def _pillow_resize_row(c, tw: int, th: int) -> tuple:
    """REAL resample via Pillow: decode, bilinear-resize, re-encode in the
    source container format (PNG when unknown).  Unreadable payloads →
    null content."""
    import io

    from PIL import Image

    if not c:
        return (None, 0, 0)
    try:
        with Image.open(io.BytesIO(bytes(c))) as img:
            fmt = img.format or "PNG"
            resized = img.resize((tw, th), resample=Image.BILINEAR)
            buf = io.BytesIO()
            resized.save(buf, format=fmt)
            return (buf.getvalue(), tw, th)
    except Exception:
        return (None, None, None)


RESIZE_IMPLS = {"fake": _fake_resize_row, "pillow": _pillow_resize_row}


def resize_image(
    df: DataFrame,
    target_width: int,
    target_height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "fake",
) -> DataFrame:
    """content → (id, content, width, height) resized via mapInPandas.

    ``impl="pillow"`` REALLY resamples (decode → bilinear resize →
    re-encode; requires Pillow, raises NotImplementedError when absent);
    ``impl="fake"`` passes payload bytes through and stamps the target
    dimensions.  The Spark contract — binary in, binary out, narrow
    transform, payloads never shuffle — is identical for both.
    """
    if impl not in RESIZE_IMPLS:
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "pillow":
        _require(impl, "PIL")
    row_fn = RESIZE_IMPLS[impl]

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
            rows = [row_fn(c, target_width, target_height) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_resize, out_schema)


def _builtin_audio_row(c) -> tuple:
    return (_builtin_audio_meta(bytes(c)) if c is not None else None) or (
        None, None, None, None,
    )


def _fake_audio_row(content) -> tuple:
    if not content:
        return (0, 0, 0.0, "NONE")
    d = hashlib.sha256(content).digest()
    rate = [8000, 16000, 22050, 44100, 48000][d[0] % 5]
    channels = 1 + d[1] % 2
    duration = round(0.5 + (d[2] | (d[3] << 8)) / 65535.0 * 299.5, 3)
    codec = ["pcm_s16le", "flac", "opus"][d[4] % 3]
    return (rate, channels, duration, codec)


def _soundfile_audio_row(c) -> tuple:
    """REAL full-codec audio metadata via soundfile/libsndfile (when
    installed): sample rate, channels, exact duration, subtype codec name.
    Unreadable payloads → nulls."""
    import io

    import soundfile as sf

    if not c:
        return (None, None, None, None)
    try:
        info = sf.info(io.BytesIO(bytes(c)))
        return (
            int(info.samplerate),
            int(info.channels),
            round(float(info.duration), 6),
            str(info.subtype or info.format).lower(),
        )
    except Exception:
        return (None, None, None, None)


AUDIO_DECODERS = {
    "builtin": _builtin_audio_row,
    "fake": _fake_audio_row,
    "soundfile": _soundfile_audio_row,
}


def decode_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "fake",
) -> DataFrame:
    """content → (id, sample_rate, n_channels, duration_s, codec, n_bytes).

    Same contract as :func:`decode_image` for the audio modality.
    ``impl="builtin"`` REALLY decodes WAV/RIFF via the stdlib ``wave``
    reader (rate/channels/exact duration/PCM codec; non-WAV → nulls);
    ``impl="fake"`` derives deterministic metadata from a digest;
    ``impl="soundfile"`` is the REAL full-codec path (requires soundfile;
    raises NotImplementedError when absent).
    """
    if impl not in AUDIO_DECODERS:
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "soundfile":
        _require(impl, "soundfile")
    row_fn = AUDIO_DECODERS[impl]

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

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [row_fn(c) for c in pdf[content_col]]
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


def _netpbm_pixels(b: bytes):
    """Decode netpbm P2/P3 (ASCII) / P5/P6 (binary) pixel values into a flat
    int list — REAL pixel data with zero codec dependencies (the formats are
    uncompressed by spec).  None when not netpbm or malformed."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in b"2356":
        return None
    try:
        kind = b[1:2]
        # header: width, height, maxval as whitespace/comment-separated ints
        fields: list[bytes] = []
        i = 2
        while len(fields) < 3 and i < len(b):
            c = b[i : i + 1]
            if c == b"#":
                while i < len(b) and b[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                start = i
                while i < len(b) and not b[i : i + 1].isspace():
                    i += 1
                fields.append(b[start:i])
        w, h, maxval = (int(f) for f in fields)
        n = w * h * (3 if kind in b"36" else 1)
        if kind in b"56":  # binary: exactly ONE whitespace byte after maxval
            i += 1
            step = 2 if maxval > 255 else 1
            raw = b[i : i + n * step]
            if len(raw) < n * step:
                return None
            if step == 1:
                return list(raw)
            return [
                int.from_bytes(raw[j : j + 2], "big") for j in range(0, len(raw), 2)
            ]
        vals = b[i:].split()
        if len(vals) < n:
            return None
        return [int(v) for v in vals[:n]]
    except (ValueError, IndexError):
        return None


def _builtin_pixel_row(c) -> tuple:
    """Real pixel stats for the uncompressed formats the builtin tier can
    decode (netpbm); other formats → nulls."""
    import math

    px = _netpbm_pixels(bytes(c)) if c else None
    if not px:
        return (None, None, None, None)
    n = len(px)
    mean = sum(px) / n  # exact integer sum, one division: bit-stable
    var = sum((v - mean) ** 2 for v in px) / n
    return (mean, math.sqrt(var), float(min(px)), float(max(px)))


def _fake_pixel_row(c) -> tuple:
    if not c:
        return (None, None, None, None)
    d = hashlib.sha256(c).digest()
    return (float(d[0]), float(d[1] % 64), float(d[2] % 16), float(240 + d[3] % 16))


def _pillow_pixel_row(c) -> tuple:
    """REAL pixel stats via Pillow: decode, convert to grayscale, aggregate
    mean/std/min/max over the pixel buffer."""
    import io

    from PIL import Image, ImageStat

    if not c:
        return (None, None, None, None)
    try:
        with Image.open(io.BytesIO(bytes(c))) as img:
            gray = img.convert("L")
            stat = ImageStat.Stat(gray)
            lo, hi = gray.getextrema()
            return (float(stat.mean[0]), float(stat.stddev[0]), float(lo), float(hi))
    except Exception:
        return (None, None, None, None)


PIXEL_IMPLS = {
    "builtin": _builtin_pixel_row,
    "fake": _fake_pixel_row,
    "pillow": _pillow_pixel_row,
}


def pixel_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    impl: str = "builtin",
) -> DataFrame:
    """content → (id, px_mean, px_std, px_min, px_max): REAL pixel-level
    statistics for image quality filtering (flat/blank detection, exposure
    outliers).  ``impl="builtin"`` decodes uncompressed netpbm pixels with
    no codec libs; ``impl="pillow"`` covers every Pillow format (grayscale-
    converted); ``impl="fake"`` is digest-derived plumbing.  Narrow
    ``mapInPandas`` — payloads never shuffle, only the 4 floats flow on."""
    if impl not in PIXEL_IMPLS:
        raise ValueError(f"unknown impl {impl!r}")
    if impl == "pillow":
        _require(impl, "PIL")
    row_fn = PIXEL_IMPLS[impl]

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("px_mean", T.DoubleType()),
            T.StructField("px_std", T.DoubleType()),
            T.StructField("px_min", T.DoubleType()),
            T.StructField("px_max", T.DoubleType()),
        ]
    )

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [row_fn(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "px_mean": [r[0] for r in rows],
                    "px_std": [r[1] for r in rows],
                    "px_min": [r[2] for r in rows],
                    "px_max": [r[3] for r in rows],
                }
            )

    return df.select(id_col, content_col).mapInPandas(_stats, out_schema)


def feature_extract(
    decoded: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Downstream feature stage over decoded metadata — pure JVM columnar ops
    (aspect ratio, size bucket), demonstrating that post-decode processing
    needs no Python."""
    return decoded.select(
        F.col(id_col),
        # guarded: a degenerate 0-height row (e.g. the fake decoder's
        # (0, 0) for empty payloads) raised DIVIDE_BY_ZERO under ANSI
        # (the Spark 4 default) and killed the whole stage; undefined
        # geometry yields NULL, matching the decode-tier null contract
        F.when(
            F.col("height") != 0, F.col("width") / F.col("height")
        ).alias("aspect_ratio"),
        F.when(F.col("width").isNull() | F.col("height").isNull(), None)
        .when(F.col("width") * F.col("height") >= 128 * 128, "large")
        .otherwise("small")
        .alias("size_bucket"),
    )
