"""Interactive SQL REPL over Arrow Flight — the reference's ``modelardb``
client CLI (crates/modelardb_client/src/main.rs: a REPL sending each
statement over Flight and printing the result stream).

Usage:
    python -m modelardb_rs_spark.cli grpc://127.0.0.1:9999
    python -m modelardb_rs_spark.cli grpc://127.0.0.1:9999 "SELECT 1 AS x"

With no SQL argument, reads statements from stdin (one per line; the
reference also accepts one statement per request, parser.rs:87-90).
``\\tables`` lists tables, ``\\quit`` exits.
"""

from __future__ import annotations

import sys

from modelardb_rs_spark.flight import ModelarFlightClient


def run_statement(client: ModelarFlightClient, sql: str) -> None:
    sql = sql.strip().rstrip(";")
    if not sql:
        return
    if sql == "\\tables":
        for t in client.tables():
            print(t)
        return
    upper = sql.upper()
    if upper.startswith("CREATE"):
        client.create(sql)
        print("ok")
    elif upper.startswith("TRUNCATE"):
        client.truncate(sql.split()[-1])
        print("ok")
    elif upper.startswith("DROP"):
        client.drop(sql.split()[-1])
        print("ok")
    elif upper.startswith("VACUUM"):
        parts = sql.split()
        client.vacuum(parts[1] if len(parts) > 1 else "")
        print("ok")
    else:
        table = client.read(sql)
        print(table.to_pandas().to_string(index=False, max_rows=50))


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    client = ModelarFlightClient(argv[0])
    if len(argv) > 1:
        run_statement(client, " ".join(argv[1:]))
        return 0
    for line in sys.stdin:
        if line.strip() in ("\\quit", "\\q", "exit"):
            break
        try:
            run_statement(client, line)
        except Exception as e:  # REPL: report and continue
            print(f"error: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
