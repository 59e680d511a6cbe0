"""Arrow Flight endpoint tests: DDL actions, do_put ingest, do_get SQL,
list_flights — modeled on the reference integration tests
(crates/modelardb_server/tests/integration_test.rs:486-1058, driven over
Flight there too)."""

import datetime
import time

import pyarrow as pa
import pytest

from modelardb_rs_spark.flight import ModelarFlightClient, start_server


@pytest.fixture()
def client(engine):
    server = start_server(engine)
    c = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
    yield c
    server.shutdown()


def test_flight_lifecycle(client):
    client.create(
        "CREATE TIME SERIES TABLE ft(timestamp TIMESTAMP, f FIELD, tag TAG)"
    )
    assert client.tables() == ["ft"]

    t0 = datetime.datetime(2024, 1, 1)
    batch = pa.table(
        {
            "timestamp": pa.array(
                [t0 + datetime.timedelta(seconds=i) for i in range(100)],
                type=pa.timestamp("us"),
            ),
            "f": pa.array([float(i % 7) for i in range(100)], type=pa.float32()),
            "tag": pa.array(["a" if i % 2 else "b" for i in range(100)]),
        }
    )
    client.write("ft", batch)

    out = client.read("SELECT tag, count(f) AS n FROM ft GROUP BY tag")
    got = dict(zip(out["tag"].to_pylist(), out["n"].to_pylist()))
    assert got == {"a": 50, "b": 50}

    # pushdown path over the wire
    agg = client.read("SELECT count(f) AS c, max(f) AS mx FROM ft")
    assert agg["c"].to_pylist() == [100]
    assert agg["mx"].to_pylist() == [6.0]

    client.truncate("ft")
    assert client.read("SELECT count(*) AS n FROM ft")["n"].to_pylist() == [0]
    client.drop("ft")
    assert client.tables() == []


def test_streamed_result_spans_many_batches(engine):
    """Results over the collect threshold must arrive as multiple
    incrementally-produced batches (bounded driver memory), not one
    collected table."""
    import modelardb_rs_spark.flight as fl

    server = start_server(engine, stream_batch_rows=100)
    old = fl._COLLECT_RESULT_LIMIT
    fl._COLLECT_RESULT_LIMIT = 0  # force the streaming path
    try:
        client = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
        engine.create_table("big", "id BIGINT, v DOUBLE")
        engine.spark.range(1000).selectExpr("id", "id * 0.5 AS v").createOrReplaceTempView(
            "big_src"
        )
        engine.read_sql("INSERT INTO big SELECT id, v FROM big_src")
        batches = list(client.read_batches("SELECT id, v FROM big ORDER BY id"))
        assert len(batches) >= 10
        ids = [i for b in batches for i in b.column("id").to_pylist()]
        assert ids == list(range(1000))
    finally:
        fl._COLLECT_RESULT_LIMIT = old
        server.shutdown()


def test_config_and_node_actions(client):
    assert client.node_type() == "embedded"
    conf = client.get_configuration()
    assert "spark.sql.shuffle.partitions" in conf
    client.update_configuration("spark.sql.shuffle.partitions", "7")
    assert client.get_configuration()["spark.sql.shuffle.partitions"] == "7"
    with pytest.raises(Exception, match="not updatable"):
        client.update_configuration("spark.master", "evil")
    names = {a.type for a in client.inner.list_actions()}
    assert {"NodeType", "GetConfiguration", "UpdateConfiguration", "KillNode",
            "FlushNode", "FlushMemory"} <= names


def test_kill_action_stops_server(engine):
    server = start_server(engine)
    client = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
    assert client.node_type() == "embedded"
    client.kill()
    deadline = time.time() + 10
    down = False
    while time.time() < deadline:
        try:
            probe = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
            probe.inner.wait_for_available(timeout=1)
            probe.node_type()
            time.sleep(0.2)
        except Exception:
            down = True
            break
    assert down


def test_time_bucket_and_edge_sql_over_flight(client):
    """The new SQL surfaces (time_bucket resample rewrite, max_by edge
    read) work over the Arrow Flight wire unchanged."""
    client.create(
        "CREATE TIME SERIES TABLE fb(timestamp TIMESTAMP, f FIELD, tag TAG)"
    )
    t0 = datetime.datetime(2024, 1, 1)
    batch = pa.table(
        {
            "timestamp": pa.array(
                [t0 + datetime.timedelta(minutes=10 * i) for i in range(30)],
                type=pa.timestamp("us"),
            ),
            "f": pa.array([float(i) for i in range(30)], type=pa.float32()),
            "tag": pa.array(["x"] * 30),
        }
    )
    client.write("fb", batch)
    out = client.read(
        "SELECT time_bucket('1 hour', timestamp) AS b, count(f) AS n "
        "FROM fb GROUP BY time_bucket('1 hour', timestamp)"
    )
    assert sorted(out["n"].to_pylist()) == [6] * 5
    last = client.read("SELECT max_by(f, timestamp) AS lv FROM fb")
    assert last["lv"].to_pylist() == [29.0]
    client.drop("fb")


def test_streamed_large_result_arrow_relay(engine):
    """>100k-row result over the streaming path: arrives as many Arrow
    batches (bounded driver memory — stream_batch_rows caps each), with
    exact content. The relay is Arrow end-to-end: executors pack IPC
    payloads, the driver never touches per-row Python objects."""
    import modelardb_rs_spark.flight as fl

    server = start_server(engine, stream_batch_rows=4096)
    old = fl._COLLECT_RESULT_LIMIT
    fl._COLLECT_RESULT_LIMIT = 0  # force the streaming path
    try:
        client = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
        engine.create_table("big2", "id BIGINT, v DOUBLE")
        engine.spark.range(120_000).selectExpr(
            "id", "id * 0.5 AS v"
        ).createOrReplaceTempView("big2_src")
        engine.read_sql("INSERT INTO big2 SELECT id, v FROM big2_src")
        n = 0
        total = 0.0
        batches = 0
        for b in client.read_batches("SELECT id, v FROM big2"):
            assert b.num_rows <= 4096
            n += b.num_rows
            total += sum(b.column("v").to_pylist())
            batches += 1
        assert n == 120_000
        assert batches >= 120_000 // 4096
        assert total == sum(i * 0.5 for i in range(120_000))
    finally:
        fl._COLLECT_RESULT_LIMIT = old
        server.shutdown()


def test_streamed_put_bounded_driver_memory(engine):
    """A large do_put must stream through bounded spill chunks — never
    materialize the whole upload on the driver (reference streams
    channel-backed batches, remote.rs:750-794). Asserts: multiple spill
    files were staged, each spill payload stays near the configured
    bound, and the ingested table is exactly right."""
    server = start_server(engine)
    server.put_spill_bytes = 1 << 20  # 1 MiB: force many spills
    spills = []
    fs = engine.folder.fs
    real_write_bytes = fs.write_bytes

    def counting_write_bytes(uri, data):
        if "/_staging/put-" in uri:
            spills.append(len(data))
        return real_write_bytes(uri, data)

    fs.write_bytes = counting_write_bytes
    try:
        client = ModelarFlightClient(f"grpc://127.0.0.1:{server.port}")
        client.create("CREATE TABLE big_put(id BIGINT, v DOUBLE)")
        n = 1_000_000
        descriptor = __import__("pyarrow.flight", fromlist=["x"]).FlightDescriptor.for_path(
            b"big_put"
        )
        schema = pa.schema([("id", pa.int64()), ("v", pa.float64())])
        writer, _ = client.inner.do_put(descriptor, schema)
        step = 50_000
        for lo in range(0, n, step):
            ids = list(range(lo, lo + step))
            writer.write_batch(
                pa.record_batch(
                    [pa.array(ids, type=pa.int64()),
                     pa.array([float(i % 97) for i in ids], type=pa.float64())],
                    schema=schema,
                )
            )
        writer.close()
        out = client.read("SELECT count(*) AS n, sum(id) AS s FROM big_put")
        assert out["n"].to_pylist() == [n]
        assert out["s"].to_pylist() == [n * (n - 1) // 2]
    finally:
        fs.write_bytes = real_write_bytes
        server.shutdown()
    # bounded memory evidence: the upload crossed the wire as many
    # spill files, none wildly above the bound (parquet compresses, so
    # files are typically SMALLER than the Arrow bytes that triggered
    # the flush; allow 4x for incompressible corners)
    assert len(spills) >= 5, spills
    assert max(spills) < 4 * server.put_spill_bytes, max(spills)
    # staging directory is cleaned up after the commit
    staging = fs.join(engine.folder.root, "_staging")
    assert not [i for i in fs.list(staging)] if fs.exists(staging) else True


def test_do_get_collect_bound_uses_reconstructed_size(engine, monkeypatch):
    """The collect-vs-stream decision must bound by the RECONSTRUCTED
    result size (commit-log point counts x row width), not Catalyst's
    segment-bytes estimate: a well-compressed table's full scan can
    look tiny at the plan level and then toArrow() a huge gridded
    result onto the driver. A stats-pushdown aggregate (no grid stage)
    must still take the fast collect path."""
    import pyarrow.flight as fl

    from modelardb_rs_spark import flight as flight_mod

    engine.read_sql(
        "CREATE TIME SERIES TABLE hc(timestamp TIMESTAMP, f FIELD, tag TAG)"
    )
    spark = engine.spark
    # 60k constant points: PMC-Mean compresses these to a handful of
    # segments, so plan bytes are tiny while the gridded result is not
    pts = spark.range(60_000).selectExpr(
        "timestamp_micros(id * 1000000) AS timestamp",
        "CAST(7.5 AS float) AS f",
        "'a' AS tag",
    )
    engine.write("hc", pts)

    server = flight_mod.ModelarFlightServer(engine)
    try:
        monkeypatch.setattr(flight_mod, "_COLLECT_RESULT_LIMIT", 256 << 10)
        scan = server.do_get(None, fl.Ticket(b"SELECT timestamp, f FROM hc"))
        agg = server.do_get(None, fl.Ticket(b"SELECT count(f) AS n FROM hc"))
        # full scan grids -> bound blows past the limit -> streamed
        assert isinstance(scan, fl.GeneratorStream), type(scan)
        # pushdown aggregate has no grid stage -> collect fast path
        assert isinstance(agg, fl.RecordBatchStream), type(agg)
        # sanity on the bound itself: far above segment plan bytes
        df = engine.read_sql("SELECT timestamp, f FROM hc")
        bound = server._result_bytes_bound("SELECT timestamp, f FROM hc", df)
        assert bound >= 60_000 * 16
    finally:
        server.shutdown()
