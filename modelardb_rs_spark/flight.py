"""Arrow Flight endpoint — the engine's wire protocol surface.

Mirrors the reference ``modelardbd`` Flight interface
(crates/modelardb_server/src/remote.rs):

- ``do_get(Ticket(sql))``            → stream query results (remote.rs:636-744)
- ``do_put(FlightDescriptor(table))``→ ingest record batches (remote.rs:750-794)
- ``do_action``                      → CreateTable / TruncateTable / DropTable /
                                       VacuumTable / FlushMemory (remote.rs:827-999)
- ``get_schema(table)``              → query schema
- ``list_flights``                   → one FlightInfo per table

Spark-first notes: results move Spark→Arrow via ``DataFrame.toArrow()``
(Arrow-native collection, no pandas hop) and ingest Arrow→Spark via
``createDataFrame`` on the Arrow table. In local mode the server collects
the full result before streaming; on a cluster this surface would sit on
the driver, with ``toLocalIterator`` for very large results — the
protocol shape is identical.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight

from modelardb_rs_spark.engine import Engine


class ModelarFlightServer(flight.FlightServerBase):
    def __init__(self, engine: Engine, location: str = "grpc://127.0.0.1:0") -> None:
        super().__init__(location)
        self.engine = engine

    # -- queries -----------------------------------------------------------

    def do_get(self, context, ticket: flight.Ticket):
        sql = ticket.ticket.decode("utf-8")
        df = self.engine.read_sql(sql)
        if df is None:  # DDL/utility statement: empty result stream
            empty = pa.table({"ok": pa.array([True])})
            return flight.RecordBatchStream(empty)
        return flight.RecordBatchStream(df.toArrow())

    # -- ingest ------------------------------------------------------------

    def do_put(self, context, descriptor: flight.FlightDescriptor, reader, writer):
        table_name = descriptor.path[0].decode("utf-8")
        arrow_table = reader.read_all()
        df = self.engine.spark.createDataFrame(arrow_table)
        self.engine.write(table_name, df)

    # -- actions -----------------------------------------------------------

    def do_action(self, context, action: flight.Action):
        body = action.body.to_pybytes().decode("utf-8") if action.body else ""
        if action.type == "CreateTable":
            self.engine.read_sql(body)
        elif action.type == "TruncateTable":
            self.engine.truncate(body)
        elif action.type == "DropTable":
            self.engine.drop(body)
        elif action.type == "VacuumTable":
            self.engine.vacuum([body] if body else None)
        elif action.type == "FlushMemory":
            pass  # batch engine: writes are durable on return
        else:
            raise flight.FlightServerError(f"unknown action {action.type!r}")
        return [flight.Result(b"ok")]

    def list_actions(self, context):
        return [
            ("CreateTable", "Execute a CREATE (TIME SERIES) TABLE statement"),
            ("TruncateTable", "Delete all data in a table"),
            ("DropTable", "Drop a table"),
            ("VacuumTable", "Vacuum one table (or all, empty body)"),
            ("FlushMemory", "No-op: batch writes are durable on return"),
        ]

    # -- metadata ----------------------------------------------------------

    def get_schema(self, context, descriptor: flight.FlightDescriptor):
        name = descriptor.path[0].decode("utf-8")
        df = self.engine.table(name)
        return flight.SchemaResult(df.limit(0).toArrow().schema)

    def list_flights(self, context, criteria):
        for name in self.engine.tables():
            descriptor = flight.FlightDescriptor.for_path(name.encode("utf-8"))
            yield flight.FlightInfo(
                pa.schema([]), descriptor, [], -1, -1
            )


def start_server(engine: Engine, port: int = 0) -> ModelarFlightServer:
    """Start a Flight server on a background thread; returns the server
    (``server.port`` for the bound port, ``server.shutdown()`` to stop)."""
    server = ModelarFlightServer(engine, f"grpc://127.0.0.1:{port}")
    threading.Thread(target=server.serve, daemon=True).start()
    return server


class ModelarFlightClient:
    """Thin client mirroring the reference ``modelardb_embedded`` Client
    (operations over Flight, crates/modelardb_embedded/src/operations/client.rs)."""

    def __init__(self, address: str) -> None:
        self.inner = flight.connect(address)

    def read(self, sql: str) -> pa.Table:
        return self.inner.do_get(flight.Ticket(sql.encode("utf-8"))).read_all()

    def write(self, table: str, data: pa.Table) -> None:
        descriptor = flight.FlightDescriptor.for_path(table.encode("utf-8"))
        writer, _ = self.inner.do_put(descriptor, data.schema)
        writer.write_table(data)
        writer.close()

    def create(self, ddl: str) -> None:
        self._action("CreateTable", ddl)

    def truncate(self, table: str) -> None:
        self._action("TruncateTable", table)

    def drop(self, table: str) -> None:
        self._action("DropTable", table)

    def vacuum(self, table: str = "") -> None:
        self._action("VacuumTable", table)

    def tables(self) -> list[str]:
        return [
            f.descriptor.path[0].decode("utf-8") for f in self.inner.list_flights()
        ]

    def _action(self, name: str, body: str) -> None:
        list(self.inner.do_action(flight.Action(name, body.encode("utf-8"))))
