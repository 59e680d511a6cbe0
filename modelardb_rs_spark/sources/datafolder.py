"""Data-folder storage layer: Parquet read/write under one root.

Reference: the Delta Lake "data folder" (tables/ + metadata/ + wal/,
crates/modelardb_storage/src/data_folder/mod.rs:89-686 and
delta_table_writer.rs:42-110). This engine keeps the same layout with
plain Parquet datasets (the container has no Delta jars; swapping
``format("parquet")`` for ``format("delta")`` on a cluster restores
ACID commits + time travel + VACUUM retention — the call sites are
isolated here on purpose):

    <root>/metadata/tables.json      catalog (catalog.py)
    <root>/tables/<name>/            one dataset per table
        field_column=N/...parquet    ts tables: partitioned by field

Segment writes are sorted within partitions by (tags..., start_time)
exactly like the reference writer (delta_table_writer.rs:66-80), so
Parquet row-group min/max statistics on start_time/end_time stay tight
and time-range scans prune well.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modelardb_rs_spark.types import TimeSeriesTableMetadata, segment_schema


class DataFolder:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = os.path.abspath(root)
        self.tables_dir = os.path.join(self.root, "tables")
        self.metadata_dir = os.path.join(self.root, "metadata")
        os.makedirs(self.tables_dir, exist_ok=True)
        os.makedirs(self.metadata_dir, exist_ok=True)

    def table_path(self, name: str) -> str:
        return os.path.join(self.tables_dir, name)

    def _has_data(self, name: str) -> bool:
        path = self.table_path(name)
        if not os.path.isdir(path):
            return False
        for _, _, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    # -- segments (time series tables) -------------------------------------

    def write_segments(self, meta: TimeSeriesTableMetadata, segments: DataFrame) -> None:
        """Append segment rows, partitioned by field_column, sorted within
        partitions by (tags..., start_time)."""
        # No repartition: the compressor already co-located each series'
        # segments in one task; an extra shuffle here would double the
        # write cost. Sorting by (field_column, tags..., start_time) keeps
        # one open Parquet writer at a time per dynamic partition and tight
        # row-group stats within each file.
        sort_cols = ["field_column", *meta.tag_columns, "start_time"]
        (
            segments.sortWithinPartitions(*sort_cols)
            .write.mode("append")
            .partitionBy("field_column")
            .parquet(self.table_path(meta.name))
        )

    def read_segments(self, meta: TimeSeriesTableMetadata) -> DataFrame:
        schema = segment_schema(meta.tag_columns)
        if not self._has_data(meta.name):
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(self.table_path(meta.name))
        # Partition discovery types field_column as int; restore int16.
        return df.withColumn("field_column", F.col("field_column").cast("short")).select(
            *[f.name for f in schema.fields]
        )

    # -- normal tables ------------------------------------------------------

    def write_normal(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.table_path(name))

    def read_normal(self, name: str, schema) -> DataFrame:
        if not self._has_data(name):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(self.table_path(name))

    # -- maintenance ---------------------------------------------------------

    def truncate(self, name: str) -> None:
        path = self.table_path(name)
        if os.path.isdir(path):
            shutil.rmtree(path)

    def drop(self, name: str) -> None:
        self.truncate(name)

    def vacuum(self, name: str, retain_seconds: int | None = None) -> None:
        """Physically delete stale files beyond the retention period
        (reference data_folder/mod.rs:582-686). Plain Parquet datasets have
        no version history, so only orphaned temporary files are removed;
        with a Delta-backed folder this maps to DeltaTable.vacuum()."""
        path = self.table_path(name)
        if not os.path.isdir(path):
            return
        for dirpath, _, files in os.walk(path):
            for f in files:
                if f.startswith("_temporary") or f.endswith(".crc") and f.startswith("."):
                    try:
                        os.remove(os.path.join(dirpath, f))
                    except OSError:
                        pass
