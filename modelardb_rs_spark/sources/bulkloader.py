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
