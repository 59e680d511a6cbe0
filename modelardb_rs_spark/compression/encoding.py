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
- irregular-> b"V" + uint32 count + zigzag-varint delta-of-deltas
              (byte-aligned analog of the reference's bit-packed
              delta-of-delta stream, timestamps.rs:16-260; the first
              delta's predecessor is implicitly 0, matching the
              reference. Near-regular series encode ~1 byte per point
              instead of 8.)
- b"I" + int64 deltas[count-1] remains readable (legacy v0 layout).

Value payloads:
- PMC-Mean -> float32 mean (the single reconstructed value)
- Swing    -> float32 v0 + float64 slope; value(t) = f32(v0 + slope*(t-t0))
- Gorilla  -> XOR-compressed stream (byte-aligned analog of the
  reference's MacaqueV bitstream, macaque_v.rs:17-310):
      b"G" + uint32 count + 2-bit-tag array (4 tags/byte) + payload
  where value i is XORed with value i-1 and stored in its lowest
  {0,1,2,4} significant bytes (tag) — identical values cost 2 bits.
  Falls back to b"W" + raw float32[count] when XOR would be larger
  (e.g. fully random data), so the codec never loses to raw.
"""

from __future__ import annotations

import struct

import numpy as np

_U32 = struct.Struct("<I")


def _zigzag(v: np.ndarray) -> np.ndarray:
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return ((u >> 1).astype(np.int64)) ^ -(u & 1).astype(np.int64)


def _varint_encode(z: np.ndarray) -> bytes:
    """LEB128-style varints for a uint64 array, fully vectorized: byte
    counts via threshold comparisons, then one scatter per byte slot."""
    n = len(z)
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (z >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(10):
        live = nbytes > j
        if not live.any():
            break
        chunk = ((z[live] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[live] - 1 > j).astype(np.uint8) << 7
        out[offsets[live] + j] = chunk | cont
    return out.tobytes()


def _varint_decode(buf: bytes) -> np.ndarray:
    """Inverse of _varint_encode, vectorized: terminator bytes mark value
    boundaries; each byte's 7-bit chunk accumulates into its value slot."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    terminator = (b & 0x80) == 0
    value_id = np.zeros(len(b), dtype=np.int64)
    np.cumsum(terminator[:-1], out=value_id[1:])
    starts = np.zeros(int(terminator.sum()), dtype=np.int64)
    starts[1:] = np.flatnonzero(terminator)[:-1] + 1
    byte_pos = np.arange(len(b)) - starts[value_id]
    acc = np.zeros(int(terminator.sum()), dtype=np.uint64)
    np.add.at(acc, value_id, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * byte_pos).astype(np.uint64))
    return acc


def encode_timestamps(ts_us: np.ndarray) -> tuple[bytes, bool]:
    """Encode a sorted int64 µs timestamp array; returns (payload, regular)."""
    n = len(ts_us)
    if n <= 2:
        # two equal timestamps must carry an explicit count: the empty
        # payload with start==end decodes to ONE point, silently dropping
        # a row ("R" with step 0 round-trips both)
        if n == 2 and ts_us[0] == ts_us[1]:
            return b"R" + _U32.pack(2), True
        return b"", True
    deltas = np.diff(ts_us)
    if (deltas == deltas[0]).all():
        return b"R" + _U32.pack(n), True
    dod = np.empty(len(deltas), dtype=np.int64)
    dod[0] = deltas[0]  # first delta's predecessor is implicitly 0
    np.subtract(deltas[1:], deltas[:-1], out=dod[1:])
    return b"V" + _U32.pack(n) + _varint_encode(_zigzag(dod)), False


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
    if flag == b"V":
        dod = _unzigzag(_varint_decode(payload[5:]))
        deltas = np.cumsum(dod)
        out = np.empty(len(deltas) + 1, dtype=np.int64)
        out[0] = start
        np.cumsum(deltas, out=out[1:])
        out[1:] += start
        return out
    deltas = np.frombuffer(payload[1:], dtype="<i8")
    out = np.empty(len(deltas) + 1, dtype=np.int64)
    out[0] = start
    np.cumsum(deltas, out=out[1:])
    out[1:] += start
    return out


def timestamps_count(payload: bytes, start: int, end: int) -> int:
    if len(payload) == 0:
        return 1 if start == end else 2
    if payload[:1] in (b"R", b"V"):
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


_TAG_TO_NBYTES = np.array([0, 1, 2, 4], dtype=np.int64)


def encode_gorilla(values_f32: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values_f32, dtype="<f4")
    n = len(v)
    if n == 0:
        return b"W"
    u = v.view("<u4").astype(np.uint32)
    x = np.empty(n, dtype=np.uint32)
    x[0] = u[0]
    np.bitwise_xor(u[1:], u[:-1], out=x[1:])
    # bytes needed for each XOR residue, snapped to {0,1,2,4}
    nbytes = np.full(n, 4, dtype=np.int64)
    nbytes[x == 0] = 0
    nbytes[(x > 0) & (x < (1 << 8))] = 1
    nbytes[(x >= (1 << 8)) & (x < (1 << 16))] = 2
    total = 5 + (n + 3) // 4 + int(nbytes.sum())
    if total >= 1 + 4 * n:
        return b"W" + v.tobytes()
    tags = np.zeros(n, dtype=np.uint8)
    tags[nbytes == 1] = 1
    tags[nbytes == 2] = 2
    tags[nbytes == 4] = 3
    padded = np.zeros(((n + 3) // 4) * 4, dtype=np.uint8)
    padded[:n] = tags
    packed = (
        padded[0::4] | (padded[1::4] << 2) | (padded[2::4] << 4) | (padded[3::4] << 6)
    )
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    data = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(4):
        live = nbytes > j
        if not live.any():
            break
        data[offsets[live] + j] = ((x[live] >> np.uint32(8 * j)) & np.uint32(0xFF)).astype(np.uint8)
    return b"G" + _U32.pack(n) + packed.tobytes() + data.tobytes()


def decode_gorilla(payload: bytes) -> np.ndarray:
    flag = payload[:1]
    if flag == b"W":
        return np.frombuffer(payload, dtype="<f4", offset=1)
    if flag != b"G":  # legacy unflagged raw float32 layout
        return np.frombuffer(payload, dtype="<f4")
    n = _U32.unpack(payload[1:5])[0]
    tag_bytes = np.frombuffer(payload, dtype=np.uint8, count=(n + 3) // 4, offset=5)
    tags = np.empty(((n + 3) // 4) * 4, dtype=np.uint8)
    tags[0::4] = tag_bytes & 3
    tags[1::4] = (tag_bytes >> 2) & 3
    tags[2::4] = (tag_bytes >> 4) & 3
    tags[3::4] = (tag_bytes >> 6) & 3
    nbytes = _TAG_TO_NBYTES[tags[:n]]
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    data = np.frombuffer(payload, dtype=np.uint8, offset=5 + (n + 3) // 4)
    x = np.zeros(n, dtype=np.uint32)
    for j in range(4):
        live = nbytes > j
        if not live.any():
            break
        x[live] |= data[offsets[live] + j].astype(np.uint32) << np.uint32(8 * j)
    u = np.bitwise_xor.accumulate(x)
    return u.astype("<u4").view("<f4")
