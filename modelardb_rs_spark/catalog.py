"""Table catalog — the engine's metadata store.

Plays the role of the reference's metadata Delta tables
(``normal_table_metadata`` / ``time_series_table_metadata`` /
``time_series_table_field_columns``,
crates/modelardb_storage/src/data_folder/mod.rs:415-520), holding table
kind, query schema, per-field error bounds, and generated-column
expressions. Stored as a single JSON document under
``<data folder>/metadata/tables.json`` — tiny, driver-side state; at
cluster scale this lives on the shared object store next to the data and
is read once per session. All I/O goes through the Hadoop FileSystem
API so the metadata directory may be any URI the session can reach
(``file://``, ``s3a://``, ...).
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import types as T

from modelardb_rs_spark.sources.hadoopfs import HadoopFS
from modelardb_rs_spark.types import TableKind, TimeSeriesTableMetadata


class Catalog:
    def __init__(self, metadata_dir: str, fs: HadoopFS) -> None:
        self._fs = fs
        self._dir = metadata_dir
        self._path = fs.join(metadata_dir, "tables.json")
        self._lock = threading.Lock()
        fs.mkdirs(metadata_dir)
        if not fs.exists(self._path):
            self._save({"tables": {}})

    def _load(self) -> dict:
        return json.loads(self._fs.read_bytes(self._path).decode("utf-8"))

    def _save(self, doc: dict) -> None:
        self._fs.write_bytes(self._path, json.dumps(doc, indent=1).encode("utf-8"))

    def tables(self) -> dict[str, TableKind]:
        doc = self._load()
        return {name: TableKind(info["kind"]) for name, info in doc["tables"].items()}

    def kind(self, name: str) -> TableKind:
        doc = self._load()
        if name not in doc["tables"]:
            raise KeyError(f"table {name!r} does not exist")
        return TableKind(doc["tables"][name]["kind"])

    def exists(self, name: str) -> bool:
        return name in self._load()["tables"]

    def add_normal_table(self, name: str, schema: T.StructType) -> None:
        with self._lock:
            doc = self._load()
            if name in doc["tables"]:
                raise ValueError(f"table {name!r} already exists")
            doc["tables"][name] = {"kind": TableKind.NORMAL.value, "schema": schema.json()}
            self._save(doc)

    def add_time_series_table(self, meta: TimeSeriesTableMetadata) -> None:
        with self._lock:
            doc = self._load()
            if meta.name in doc["tables"]:
                raise ValueError(f"table {meta.name!r} already exists")
            doc["tables"][meta.name] = {
                "kind": TableKind.TIME_SERIES.value,
                "metadata": meta.to_json(),
            }
            self._save(doc)

    def drop(self, name: str) -> None:
        with self._lock:
            doc = self._load()
            if name not in doc["tables"]:
                raise KeyError(f"table {name!r} does not exist")
            del doc["tables"][name]
            self._save(doc)

    def normal_table_schema(self, name: str) -> T.StructType:
        doc = self._load()
        info = doc["tables"][name]
        if info["kind"] != TableKind.NORMAL.value:
            raise ValueError(f"table {name!r} is not a normal table")
        return T.StructType.fromJson(json.loads(info["schema"]))

    def time_series_metadata(self, name: str) -> TimeSeriesTableMetadata:
        doc = self._load()
        if name not in doc["tables"]:
            raise KeyError(f"table {name!r} does not exist")
        info = doc["tables"][name]
        if info["kind"] != TableKind.TIME_SERIES.value:
            raise ValueError(f"table {name!r} is not a time series table")
        return TimeSeriesTableMetadata.from_json(info["metadata"])
