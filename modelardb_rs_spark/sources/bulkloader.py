"""Bulk import/export — the reference's ``modelardbb`` CLI
(crates/modelardb_bulkloader/src/main.rs:60-140) as library functions:

    modelardbb import  -> import_parquet(engine, table, path, ...)
    modelardbb export  -> export_parquet(engine, sql, path, ...)

with the same knobs: ``pre_sql``/``post_sql`` hooks, ``cast_double_to_float``
(the reference casts Float64 parquet columns down to the engine's Float32
fields), and export ``partition_by``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from modelardb_rs_spark.engine import Engine


def import_parquet(
    engine: Engine,
    table: str,
    path: str,
    pre_sql: list[str] | None = None,
    post_sql: list[str] | None = None,
    cast_double_to_float: bool = False,
) -> int:
    """Append a Parquet dataset to a table (compressing if the target is
    a time series table). Returns the number of imported rows."""
    for sql in pre_sql or []:
        engine.read_sql(sql)
    engine.catalog.kind(table)  # fail fast (clear error) before reading files
    df = engine.spark.read.parquet(path)
    if cast_double_to_float:
        df = df.select(
            *[
                F.col(f.name).cast("float").alias(f.name)
                if isinstance(f.dataType, T.DoubleType)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    n = df.count()
    engine.write(table, df)
    for sql in post_sql or []:
        engine.read_sql(sql)
    return n


def export_parquet(
    engine: Engine,
    sql: str,
    path: str,
    partition_by: list[str] | None = None,
    pre_sql: list[str] | None = None,
    post_sql: list[str] | None = None,
) -> None:
    """Run a query and write the result as Parquet (gridded data for time
    series tables — the reference exports reconstructed points the same
    way)."""
    for s in pre_sql or []:
        engine.read_sql(s)
    df = engine.read_sql(sql)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    for s in post_sql or []:
        engine.read_sql(s)


def export_delta(
    engine: Engine,
    sql: str,
    path: str,
    partition_by: list[str] | None = None,
    pre_sql: list[str] | None = None,
    post_sql: list[str] | None = None,
) -> dict:
    """Export a query result as a DELTA LAKE table readable by stock
    Delta clients (delta-rs / ``deltalake`` / DuckDB ``delta_scan`` /
    Spark+delta jars): Parquet data files plus a spec-conformant
    ``_delta_log/00000000000000000000.json`` commit (protocol 1/2,
    metaData with the Spark-JSON schemaString — the format Delta
    specifies — and one add action per file with partitionValues).

    The container ships no external Delta reader, so conformance is
    asserted structurally in tests (actions schema, partition values,
    file sizes, schemaString round-trip) — the log is written from the
    PUBLIC Delta transaction-log spec
    (https://github.com/delta-io/delta/blob/master/PROTOCOL.md).
    Reference tables are native Delta the same way
    (crates/modelardb_storage/src/data_folder/mod.rs:89-260).

    Returns {"files": n, "rows": n}.
    """
    import json
    import time
    import uuid
    from urllib.parse import unquote

    for s in pre_sql or []:
        engine.read_sql(s)
    df = engine.read_sql(sql)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # row count from the WRITTEN files (Parquet metadata-only count) —
    # never by re-executing the query, whose inputs post_sql may mutate
    n_rows = engine.spark.read.parquet(path).count()
    for s in post_sql or []:
        engine.read_sql(s)

    from modelardb_rs_spark.sources.hadoopfs import HadoopFS

    fs = HadoopFS(engine.spark, path)
    root = fs.base.rstrip("/")
    now_ms = int(time.time() * 1000)
    adds = []
    for info in fs.list_files_recursive(root):
        if not info.path.endswith(".parquet"):
            continue
        rel = info.path[len(root) + 1 :]
        part_values = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                part_values[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": part_values,
                    "size": info.size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "Overwrite"},
                "engineInfo": "modelardb_rs_spark bulkloader",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": partition_by or [],
                "configuration": {},
                "createdTime": now_ms,
            }
        },
        *adds,
    ]
    log_dir = fs.join(root, "_delta_log")
    fs.mkdirs(log_dir)
    payload = "\n".join(json.dumps(a, separators=(",", ":")) for a in actions) + "\n"
    fs.write_bytes(fs.join(log_dir, f"{0:020d}.json"), payload.encode("utf-8"))
    return {"files": len(adds), "rows": n_rows}
