"""Hypothesis property tests for the binary codecs (varint timestamps,
XOR values) — every encodable input must round-trip bit-exactly."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from modelardb_rs_spark.compression import encoding as e


def test_duplicate_timestamp_pair_roundtrips():
    """Two equal timestamps must decode to two points (an empty payload
    with start==end means ONE point), and fit_series must agree."""
    ts = np.array([1000, 1000], dtype=np.int64)
    payload, _ = e.encode_timestamps(ts)
    back = e.decode_timestamps(payload, 1000, 1000)
    assert np.array_equal(back, ts)
    assert e.timestamps_count(payload, 1000, 1000) == 2

    from modelardb_rs_spark.compression.fitter import fit_series
    from modelardb_rs_spark.types import ErrorBound

    cols = fit_series(ts, np.array([1.0, 1.0], dtype=np.float32), ErrorBound.lossless())
    n_decoded = sum(
        len(e.decode_timestamps(p, s, t))
        for p, s, t in zip(cols["timestamps"], cols["start_time"], cols["end_time"])
    )
    assert n_decoded == sum(cols["value_count"]) == 2


@settings(max_examples=200, deadline=None)
@given(
    deltas=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
def test_timestamps_roundtrip(deltas):
    ts = np.cumsum(np.array([0] + deltas, dtype=np.int64)) + 1_000_000
    payload, _ = e.encode_timestamps(ts)
    back = e.decode_timestamps(payload, int(ts[0]), int(ts[-1]))
    assert np.array_equal(back, ts)
    assert e.timestamps_count(payload, int(ts[0]), int(ts[-1])) == len(ts)


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.floats(width=32, allow_nan=True, allow_infinity=True),
        min_size=0,
        max_size=400,
    )
)
def test_gorilla_roundtrip(vals):
    v = np.array(vals, dtype=np.float32)
    back = e.decode_gorilla(e.encode_gorilla(v))
    assert len(back) == len(v)
    # bit-exact, including every NaN payload pattern
    assert np.array_equal(back.view(np.uint32), v.view(np.uint32))


@settings(max_examples=100, deadline=None)
@given(zs=st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300))
def test_varint_roundtrip(zs):
    z = np.array(zs, dtype=np.uint64)
    assert np.array_equal(e._varint_decode(e._varint_encode(z)), z)
