"""Compression-core tests: round-trip within every error-bound kind.

Mirrors the reference test strategy (SURVEY.md §5): model fit/grid
round-trips on generator-produced series (reference
modelardb_test/src/data_generation.rs:70-128 — constant / linear /
random sections, regular and irregular timestamps) plus
hypothesis-driven edge cases (NaN, ±inf, bound boundaries).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modelardb_rs_spark.compression.decode import decode_segments
from modelardb_rs_spark.compression.fitter import fit_series
from modelardb_rs_spark.compression import encoding
from modelardb_rs_spark.types import ErrorBound


def generate_series(rng, length=5000, irregular=False):
    """Python analog of the reference's generate_univariate_time_series
    (data_generation.rs:100-128): concatenated constant/linear/random
    sections exercising each model type."""
    values = []
    while sum(len(v) for v in values) < length:
        n = int(rng.integers(100, 500))
        kind = rng.integers(0, 3)
        if kind == 0:
            values.append(np.full(n, float(rng.uniform(-100, 100)), np.float32))
        elif kind == 1:
            a, b = rng.uniform(-100, 100, 2)
            values.append(np.linspace(a, b, n).astype(np.float32))
        else:
            values.append(rng.uniform(-1000, 1000, n).astype(np.float32))
    v = np.concatenate(values)[:length]
    if irregular:
        deltas = rng.integers(1, 2_000_000, length)
        ts = np.cumsum(deltas).astype(np.int64)
    else:
        ts = np.arange(length, dtype=np.int64) * 1_000_000
    return ts, v


def roundtrip(ts, v, bound):
    cols = fit_series(ts, v, bound)
    pdf = pd.DataFrame(cols)
    pts = decode_segments(pdf, []).sort_values("timestamp").reset_index(drop=True)
    assert (pts["timestamp"].to_numpy() == ts).all()
    assert pts["value"].dtype == np.float32
    return pts["value"].to_numpy(), cols


@pytest.mark.parametrize("irregular", [False, True])
def test_lossless_roundtrip_exact(irregular):
    rng = np.random.default_rng(42)
    ts, v = generate_series(rng, irregular=irregular)
    r, cols = roundtrip(ts, v, ErrorBound.lossless())
    assert np.array_equal(r, v)


@pytest.mark.parametrize("irregular", [False, True])
def test_absolute_bound_roundtrip(irregular):
    rng = np.random.default_rng(7)
    ts, v = generate_series(rng, irregular=irregular)
    bound = 2.5
    r, cols = roundtrip(ts, v, ErrorBound.absolute(bound))
    assert (np.abs(r.astype(np.float64) - v.astype(np.float64)) <= bound).all()


@pytest.mark.parametrize("irregular", [False, True])
def test_relative_bound_roundtrip(irregular):
    rng = np.random.default_rng(3)
    ts, v = generate_series(rng, irregular=irregular)
    pct = 5.0
    r, cols = roundtrip(ts, v, ErrorBound.relative(pct))
    o = v.astype(np.float64)
    assert (np.abs(r.astype(np.float64) - o) <= np.abs(o) * pct / 100 + 1e-12).all()


def test_seg_stats_match_reconstruction():
    """value_count / seg_sum / min_value / max_value must describe the
    *reconstructed* values exactly — the invariant behind segment-pushdown
    aggregates equalling gridded aggregates."""
    rng = np.random.default_rng(11)
    ts, v = generate_series(rng)
    cols = fit_series(ts, v, ErrorBound.absolute(1.0))
    pdf = pd.DataFrame(cols)
    pts = decode_segments(pdf, [])
    r = pts["value"].to_numpy().astype(np.float64)
    assert sum(cols["value_count"]) == len(r)
    assert abs(sum(cols["seg_sum"]) - r.sum()) < 1e-6 * max(1.0, abs(r.sum()))
    assert np.float32(min(cols["min_value"])) == np.float32(r.min())
    assert np.float32(max(cols["max_value"])) == np.float32(r.max())


def test_nan_and_inf_survive_lossy_bounds():
    """Special values must round-trip bit-exactly even under a lossy
    bound (quantization only snaps finite values, and only within it)."""
    ts = np.arange(10, dtype=np.int64) * 1_000_000
    v = np.array([1.0, np.nan, np.inf, -np.inf, 0.0, np.nan, 5.0, 5.0, 5.0, 2.0], np.float32)
    r, cols = roundtrip(ts, v, ErrorBound.absolute(1.0))
    special = ~np.isfinite(v)
    assert np.array_equal(r[special], v[special], equal_nan=True)
    finite = np.isfinite(v)
    assert (np.abs(r[finite].astype(np.float64) - v[finite].astype(np.float64)) <= 1.0).all()
    # and fully exact when lossless
    r2, _ = roundtrip(ts, v, ErrorBound.lossless())
    assert np.array_equal(r2, v, equal_nan=True)


def test_single_and_two_point_series():
    for n in (1, 2):
        ts = np.arange(n, dtype=np.int64) * 1_000_000
        v = np.arange(n, dtype=np.float32) + 0.5
        r, cols = roundtrip(ts, v, ErrorBound.lossless())
        assert np.array_equal(r, v)


def test_timestamps_codec():
    regular = np.arange(100, dtype=np.int64) * 500_000
    irregular = np.cumsum(np.array([0, 3, 1, 10, 2, 7], np.int64))
    for ts in (regular, irregular, np.array([5], np.int64), np.array([5, 9], np.int64)):
        payload, _ = encoding.encode_timestamps(ts)
        out = encoding.decode_timestamps(payload, int(ts[0]), int(ts[-1]))
        assert np.array_equal(out, ts)
        assert encoding.timestamps_count(payload, int(ts[0]), int(ts[-1])) == len(ts)


@settings(max_examples=50, deadline=None)
@given(
    data=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, width=32, allow_nan=False),
        min_size=1,
        max_size=300,
    ),
    bound_kind=st.sampled_from(["lossless", "absolute", "relative"]),
)
def test_property_roundtrip_within_bound(data, bound_kind):
    v = np.array(data, np.float32)
    ts = np.arange(len(v), dtype=np.int64) * 1_000_000
    if bound_kind == "lossless":
        bound = ErrorBound.lossless()
    elif bound_kind == "absolute":
        bound = ErrorBound.absolute(0.75)
    else:
        bound = ErrorBound.relative(2.0)
    r, _ = roundtrip(ts, v, bound)
    o = v.astype(np.float64)
    rr = r.astype(np.float64)
    if bound_kind == "lossless":
        assert np.array_equal(r, v)
    elif bound_kind == "absolute":
        assert (np.abs(rr - o) <= 0.75).all()
    else:
        assert (np.abs(rr - o) <= np.abs(o) * 0.02 + 1e-12).all()


def test_volume_bucketing_ingest_paths(engine, spark, monkeypatch):
    """The large-input ingest shuffle (stats-pass bucketing — the path a
    100 TB insert takes, normally gated behind a 1 GiB size estimate)
    must round-trip exactly like the small-input range path, for tagged,
    cardinality-saturated, and untagged inputs."""
    import datetime

    from pyspark.sql import Row

    from modelardb_rs_spark.operators import compress as C

    monkeypatch.setattr(C, "_SMALL_INPUT_BYTES", 0)
    TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    # tagged: 2 series share 4000 points -> per-series time buckets
    engine.read_sql("CREATE TIME SERIES TABLE vb(timestamp TIMESTAMP, f FIELD, tag TAG)")
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), f=float(i % 5), tag=f"t{i % 2}")
        for i in range(4000)
    ]
    engine.write("vb", spark.createDataFrame(rows))
    assert engine.table("vb").count() == 4000
    assert (
        engine.read_sql("SELECT sum(f) AS s FROM vb").collect()[0].s
        == sum(float(i % 5) for i in range(4000))
    )

    # saturated cardinality: more series than 8x the target parallelism
    # short-circuits to hash-on-tags (no per-series stats to the driver)
    from modelardb_rs_spark.types import segment_schema  # noqa: F401

    meta = engine.catalog.time_series_metadata("vb")
    many = spark.createDataFrame(
        [
            Row(timestamp=TS0 + datetime.timedelta(seconds=i), f=1.0, tag=f"s{i % 20}")
            for i in range(400)
        ]
    )
    segs = C.compress(many, meta, range_partitions=2)
    agg = segs.groupBy().sum("value_count").collect()[0][0]
    assert agg == 400
    assert segs.select("tag").distinct().count() == 20

    # untagged: one global series -> pure time bucketing
    engine.read_sql("CREATE TIME SERIES TABLE vu(timestamp TIMESTAMP, f FIELD)")
    engine.write(
        "vu",
        spark.createDataFrame(
            [Row(timestamp=TS0 + datetime.timedelta(seconds=i), f=1.0) for i in range(3000)]
        ),
    )
    assert engine.table("vu").count() == 3000
