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

try:  # real image codec, if the environment provides Pillow
    from PIL import Image as _PILImage  # noqa: F401
    import io as _io

    def _pillow_codec(payload: bytes, media_type: str) -> np.ndarray:
        return np.asarray(_PILImage.open(_io.BytesIO(payload)).convert("L")).ravel()

    register_codec("image", _pillow_codec)
except ImportError:  # container has no codecs; the seam stays, stubbed
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
