"""Binary payload encodings for segment rows.

Simplified, documented divergence from the reference byte layouts
(crates/modelardb_compression/src/timestamps.rs:16-260 delta-of-delta
varints, macaque_v.rs XOR bitstream): we use flag-byte + fixed-width
little-endian arrays. Query-visible semantics (which timestamps/values a
segment reconstructs) are identical; the byte layout is not, trading some
storage density for Arrow/numpy-native decode speed. Parquet ZSTD page
compression recovers most of the density in practice.

Timestamp payloads (reference timestamps.rs semantics):
- 1 point  -> b""            (start_time == end_time)
- 2 points -> b""            (start_time != end_time)
- regular  -> b"R" + uint32 count  (timestamps are an arithmetic sequence)
- irregular-> b"I" + int64 deltas[count-1]

Value payloads:
- PMC-Mean -> float32 mean (the single reconstructed value)
- Swing    -> float32 v0 + float64 slope; value(t) = f32(v0 + slope*(t-t0))
- Gorilla  -> float32 raw values[count]
"""

from __future__ import annotations

import struct

import numpy as np

_U32 = struct.Struct("<I")


def encode_timestamps(ts_us: np.ndarray) -> tuple[bytes, bool]:
    """Encode a sorted int64 µs timestamp array; returns (payload, regular)."""
    n = len(ts_us)
    if n <= 2:
        return b"", True
    deltas = np.diff(ts_us)
    if (deltas == deltas[0]).all():
        return b"R" + _U32.pack(n), True
    return b"I" + deltas.astype("<i8").tobytes(), False


def decode_timestamps(payload: bytes, start: int, end: int) -> np.ndarray:
    """Inverse of encode_timestamps → int64 µs array."""
    if len(payload) == 0:
        if start == end:
            return np.array([start], dtype=np.int64)
        return np.array([start, end], dtype=np.int64)
    flag = payload[:1]
    if flag == b"R":
        n = _U32.unpack(payload[1:5])[0]
        step = (end - start) // (n - 1)
        return start + step * np.arange(n, dtype=np.int64)
    deltas = np.frombuffer(payload[1:], dtype="<i8")
    out = np.empty(len(deltas) + 1, dtype=np.int64)
    out[0] = start
    np.cumsum(deltas, out=out[1:])
    out[1:] += start
    return out


def timestamps_count(payload: bytes, start: int, end: int) -> int:
    if len(payload) == 0:
        return 1 if start == end else 2
    if payload[:1] == b"R":
        return _U32.unpack(payload[1:5])[0]
    return (len(payload) - 1) // 8 + 1


def encode_pmc(mean: float) -> bytes:
    return np.float32(mean).tobytes()


def decode_pmc(payload: bytes) -> np.float32:
    return np.frombuffer(payload, dtype="<f4")[0]


def encode_swing(v0: float, slope: float) -> bytes:
    return np.float32(v0).tobytes() + np.float64(slope).tobytes()


def decode_swing(payload: bytes) -> tuple[np.float64, np.float64]:
    v0 = np.frombuffer(payload[:4], dtype="<f4")[0]
    slope = np.frombuffer(payload[4:12], dtype="<f8")[0]
    return np.float64(v0), slope


def encode_gorilla(values_f32: np.ndarray) -> bytes:
    return values_f32.astype("<f4").tobytes()


def decode_gorilla(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<f4")
