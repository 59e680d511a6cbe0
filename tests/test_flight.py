"""Arrow Flight endpoint tests: DDL actions, do_put ingest, do_get SQL,
list_flights — modeled on the reference integration tests
(crates/modelardb_server/tests/integration_test.rs:486-1058, driven over
Flight there too)."""

import datetime

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
