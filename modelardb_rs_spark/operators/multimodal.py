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


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a pixel/sample array.

    STUB: real decoding requires image/audio codecs not present in this
    environment; the ``fake`` codec interprets the payload bytes directly
    as uint8 samples (deterministic, shape-stable) so the full pipeline
    is testable.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires codec libraries (PIL/ffmpeg) not "
            "available in this environment; pass fake=True for the "
            "deterministic byte-interpreting codec"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame, fake_codec: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` so one task streams many records without
    materializing the whole partition; only (media_id, media_type,
    payload) are read (column pruning)."""
    src = media.select("media_id", "media_type", "payload")

    def extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                samples = decode_media(bytes(payload), mtype, fake=fake_codec)
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
