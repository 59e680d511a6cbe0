"""JVM grid fast path: PMC/Swing segments with regular timestamps are
reconstructed by pure Column algebra (operators/grid.py::_grid_jvm);
Gorilla / irregular segments keep the vectorized pandas decode. The two
branches must agree bitwise with the pandas decoder for every segment
shape (the reference pins GridExec semantics the same way,
crates/modelardb_storage/src/query/grid_exec.rs:261-391)."""

import datetime

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
US0 = int(TS0.timestamp()) * 1_000_000


def _mixed_rows(rng):
    """One series per shape: constant (PMC), linear (Swing), random
    (Gorilla), and an irregular-timestamp linear run."""
    rows = []
    for i in range(300):
        t = TS0 + datetime.timedelta(seconds=i)
        rows.append(Row(timestamp=t, v=1.5, tag="const"))
        rows.append(Row(timestamp=t, v=float(i) * 0.25 - 3.0, tag="linear"))
        rows.append(Row(timestamp=t, v=float(rng.standard_normal()), tag="random"))
    off = 0
    for i in range(300):
        off += int(rng.integers(1, 5)) * 250_000  # irregular µs steps
        rows.append(
            Row(
                timestamp=TS0 + datetime.timedelta(microseconds=off),
                v=float(i),
                tag="irregular",
            )
        )
    return rows


@pytest.fixture()
def mixed(engine, spark):
    engine.read_sql("CREATE TIME SERIES TABLE m(timestamp TIMESTAMP, v FIELD, tag TAG)")
    rng = np.random.default_rng(7)
    df = spark.createDataFrame(_mixed_rows(rng))
    engine.write("m", df)
    return engine, df


def _collected(df):
    return sorted(
        (r["tag"], int(r["timestamp"].timestamp() * 1_000_000), r["v"])
        for r in df.collect()
    )


def test_fast_path_matches_pandas_decode(mixed):
    """Dropping the param columns forces the legacy all-pandas decode;
    results must be identical (bitwise float32) to the split plan."""
    engine, _ = mixed
    split = _collected(engine.table("m"))

    meta = engine.catalog.time_series_metadata("m")
    legacy_segments = engine.segments("m").drop("param0", "param1", "ts_kind")
    from modelardb_rs_spark.operators import grid as grid_ops

    legacy = _collected(grid_ops.grid(legacy_segments, meta))
    assert split == legacy


def test_roundtrip_through_fast_path(mixed):
    """Lossless table: the gridded view must equal the ingested rows."""
    engine, df = mixed
    got = _collected(engine.table("m"))
    exp = sorted(
        (r["tag"], int(r["timestamp"].timestamp() * 1_000_000), np.float32(r["v"]))
        for r in df.collect()
    )
    assert len(got) == len(exp)
    assert got == [(t, ts, np.float32(v)) for t, ts, v in exp]


def test_fast_cond_splits_by_segment_shape(mixed):
    engine, _ = mixed
    segs = engine.segments("m")
    by_tag = {
        r["tag"]: (r["kinds"], r["models"])
        for r in segs.groupBy("tag")
        .agg(
            F.collect_set("ts_kind").alias("kinds"),
            F.collect_set("model_type_id").alias("models"),
        )
        .collect()
    }
    assert by_tag["const"][0] == [0] and by_tag["const"][1] == [0]
    assert by_tag["linear"][0] == [0] and by_tag["linear"][1] == [1]
    assert by_tag["random"][1] == [2]
    assert 1 in by_tag["irregular"][0]


def test_commit_log_records_all_fast(engine, spark):
    """A purely-linear write must be marked all_fast in its add entries;
    a random write must not — and the all-fast table's grid plan then
    has no Python stage (asserted in test_plans)."""
    engine.read_sql("CREATE TIME SERIES TABLE f(timestamp TIMESTAMP, v FIELD)")
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), v=float(i)) for i in range(200)
    ]
    engine.write("f", spark.createDataFrame(rows))
    entries = [
        e for c in engine.folder.log("f").commits() for e in c.get("add", [])
    ]
    assert entries and all(e.get("all_fast") is True for e in entries)

    rng = np.random.default_rng(3)
    engine.read_sql("CREATE TIME SERIES TABLE g(timestamp TIMESTAMP, v FIELD)")
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), v=float(rng.standard_normal()))
        for i in range(200)
    ]
    engine.write("g", spark.createDataFrame(rows))
    entries = [
        e for c in engine.folder.log("g").commits() for e in c.get("add", [])
    ]
    assert entries and not all(e.get("all_fast") is True for e in entries)
