"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside; the
Spark-side machinery — schemas, partition-friendly batch shapes,
Arrow-vectorized ``mapInPandas`` UDF signatures — is real and tested.
The actual codec step is stubbed: this container has no image/audio
libraries, so ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake codec is requested (the fake derives "pixels" from
the payload bytes, so every downstream feature is reproducible and
testable end-to-end).

At 100 TB: binaries ride in Parquet with large row groups; feature
extraction is map-only (no shuffle), Arrow-batched, and column-pruned —
a task reads only (id, payload), never the rest of the row.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("std_byte", T.DoubleType(), False),
        T.StructField("byte_histogram", T.ArrayType(T.LongType()), False),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake media column from a text column:
    payload = md5 bytes of the text, metadata from the leading bytes.
    Pure Column algebra — exists so the binary plumbing can be exercised
    (and oracle-checked) without real media files."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        (F.conv(F.substring(F.md5(F.col(text_col)), 1, 2), 16, 10).cast("int") + 1).alias("width"),
        (F.conv(F.substring(F.md5(F.col(text_col)), 3, 2), 16, 10).cast("int") + 1).alias("height"),
        F.lit(1).alias("n_frames"),
    )


# ------------------------------------------------------- codec registry
#
# A codec is ``fn(payload: bytes, media_type: str) -> np.ndarray`` of
# uint8/float samples. Operators never hard-code a decoder: they take a
# codec NAME, resolved per Arrow batch on the executor, so a real
# decoder (PIL, soundfile, ffmpeg bindings) drops in with one
# register_codec() call and zero operator changes. Registration is
# module-level; executors re-import this module, so codecs registered
# at import time (e.g. in a site package or a --py-files shim) are
# visible cluster-wide. Codecs registered only on the driver AFTER
# import ship with the closure instead (fn is captured by name lookup
# at call time inside the UDF — see _resolve_codec).

_CODECS: dict[str, "callable"] = {}


def register_codec(name: str, fn) -> None:
    """Register ``fn(payload: bytes, media_type: str) -> np.ndarray``
    under ``name``. Re-registering replaces (lets an application
    override 'image' with a better decoder)."""
    _CODECS[name] = fn


def registered_codecs() -> list[str]:
    return sorted(_CODECS)


def _fake_codec(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: payload bytes ARE the samples — every
    downstream feature is reproducible without real codec libraries."""
    return np.frombuffer(payload, dtype=np.uint8)


register_codec("fake", _fake_codec)


# --- real, dependency-free image decoders (BMP / PGM) -----------------
#
# The registry seam is only proven if a REAL decoder runs through it in
# CI. BMP (uncompressed 8-bit palette / 24- and 32-bit) and PGM (P5/P2)
# are simple enough to decode with the standard library + numpy, per
# their public format specs — so the 'image' codec works out of the box
# with zero third-party dependencies; Pillow (when importable) replaces
# it with a full-format decoder, same contract.


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to row-major grayscale uint8 samples.

    Supports the common Windows BITMAPINFOHEADER layout: 8-bit paletted
    (palette's green channel as gray), 24-bit BGR, and 32-bit BGRX; rows
    are 4-byte aligned and stored bottom-up (top-down when height is
    negative). Color collapses to luma via integer BT.601
    ((299R+587G+114B)//1000) so results are bit-reproducible anywhere.
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"only uncompressed BMP supported (BI_RGB), got {compression}")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * bpp // 8 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height, offset=pixel_off)
    raster = raster.reshape(height, row_bytes)
    if not top_down:
        raster = raster[::-1]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        # palette entries are BGRX right after the DIB header
        pal = np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size)
        gray = pal.reshape(n_colors, 4)[:, 1]  # green channel as gray
        return gray[raster[:, :width]].ravel()
    if bpp in (24, 32):
        step = bpp // 8
        px = raster[:, : width * step].reshape(height, width, step)
        b = px[:, :, 0].astype(np.uint32)
        g = px[:, :, 1].astype(np.uint32)
        r = px[:, :, 2].astype(np.uint32)
        return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8).ravel()
    raise ValueError(f"unsupported BMP bit depth {bpp}")


def decode_pgm(payload: bytes) -> np.ndarray:
    """Decode a PGM (P5 binary / P2 ASCII, maxval <= 255) to row-major
    grayscale uint8 samples."""
    # header tokens (magic, width, height, maxval) with '#' comments
    pos = 0
    tokens: list[bytes] = []
    while len(tokens) < 4:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError(f"only 8-bit PGM supported, maxval={maxval}")
    if magic == b"P5":
        pos += 1  # exactly one whitespace byte after maxval
        return np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
    if magic == b"P2":
        vals = payload[pos:].split()
        return np.array(vals[: w * h], dtype=np.uint8)
    raise ValueError(f"not a PGM payload (magic {magic!r})")


def _builtin_image_codec(payload: bytes, media_type: str) -> np.ndarray:
    """Sniff the container by magic bytes and decode: BMP and PGM are
    handled natively; anything else needs Pillow (which replaces this
    codec entirely when importable)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P2"):
        return decode_pgm(payload)
    raise NotImplementedError(
        "built-in image codec handles BMP and PGM; install Pillow for "
        f"other formats (payload starts with {payload[:4]!r})"
    )


register_codec("image", _builtin_image_codec)

try:  # Pillow upgrades 'image' to a full-format decoder when present
    from PIL import Image as _PILImage  # noqa: F401
    import io as _io

    def _pillow_codec(payload: bytes, media_type: str) -> np.ndarray:
        return np.asarray(_PILImage.open(_io.BytesIO(payload)).convert("L")).ravel()

    register_codec("image", _pillow_codec)
except ImportError:  # no Pillow: the built-in BMP/PGM decoder stays
    pass


def _resolve_codec(name: str):
    fn = _CODECS.get(name)
    if fn is None:
        raise NotImplementedError(
            f"no codec registered under {name!r} (have {registered_codecs()}); "
            "real media decoding requires codec libraries (PIL/soundfile/"
            "ffmpeg) — register one with register_codec(name, fn), or use "
            "the deterministic 'fake' codec"
        )
    return fn


def decode_media(payload: bytes, media_type: str, codec: str = "fake", *, fake: bool | None = None) -> np.ndarray:
    """Decode one media payload to a pixel/sample array via a registered
    codec. Defaults align with extract_features (the deterministic
    'fake' codec — the CI path); ``fake=False`` is the
    backwards-compatible spelling of ``codec='image'`` and raises
    NotImplementedError unless a real image codec is registered (Pillow
    auto-registers when importable, replacing the stub contract with a
    real decoder)."""
    if fake is not None:
        codec = "fake" if fake else "image"
    return _resolve_codec(codec)(payload, media_type)


def extract_features(
    media: DataFrame, fake_codec: bool | None = None, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` so one task streams many records without
    materializing the whole partition; only (media_id, media_type,
    payload) are read (column pruning). ``codec`` names a registered
    decoder; the driver-registered function is captured in the UDF
    closure, so late registrations work without shipping the module."""
    if fake_codec is not None:
        codec = "fake" if fake_codec else "image"
    codec_fn = _resolve_codec(codec)  # fail fast on the driver
    src = media.select("media_id", "media_type", "payload")

    def extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                samples = codec_fn(bytes(payload), mtype)
                hist = np.bincount(samples >> 4, minlength=16)
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(samples),
                        "mean_byte": float(samples.mean()) if len(samples) else 0.0,
                        "std_byte": float(samples.std()) if len(samples) else 0.0,
                        "byte_histogram": hist.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return src.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),
    ]
)


def resize_media(
    media: DataFrame, out_w: int = 4, out_h: int = 4, codec: str = "fake"
) -> DataFrame:
    """Nearest-neighbor resize through the codec registry: decode each
    payload to samples, view them as a row-major (height, width) raster
    (indices wrap modulo the sample count, so short payloads tile
    deterministically), and emit the (out_h, out_w) raster row-major.

    Arrow-batched ``mapInPandas`` over the pruned (id, payload,
    width, height) columns — map-only, no shuffle; a real image codec
    (Pillow) makes this true pixel resizing with zero operator changes.
    """
    if out_w < 1 or out_h < 1:
        raise ValueError("target dimensions must be positive")
    codec_fn = _resolve_codec(codec)
    src = media.select("media_id", "media_type", "payload", "width", "height")

    def rz(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rr, cc = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
        for pdf in batches:
            rows = []
            for mid, mtype, payload, w, h in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                samples = codec_fn(bytes(payload), mtype)
                n = max(len(samples), 1)
                src_r = (rr * int(h)) // out_h
                src_c = (cc * int(w)) // out_w
                idx = (src_r * int(w) + src_c) % n
                pixels = samples[idx.ravel()] if len(samples) else np.zeros(out_h * out_w, dtype=np.uint8)
                rows.append(
                    {
                        "media_id": mid,
                        "out_h": out_h,
                        "out_w": out_w,
                        "pixels": [int(x) for x in pixels],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return src.mapInPandas(rz, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: emit every nth 4-byte
    "frame" of the payload as its own row (map-only explode; the real
    implementation would seek keyframes via the codec)."""
    frames = F.expr(
        f"transform(sequence(0, int(octet_length(payload)/4) - 1), i -> substring(payload, i*4+1, 4))"
    )
    return (
        media.withColumn("__frames__", frames)
        .select(
            "media_id",
            F.posexplode(F.col("__frames__")).alias("frame_idx", "frame"),
        )
        .where(F.col("frame_idx") % every_nth == 0)
    )
