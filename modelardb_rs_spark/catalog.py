"""Table catalog — the engine's metadata store.

Plays the role of the reference's metadata Delta tables
(``normal_table_metadata`` / ``time_series_table_metadata`` /
``time_series_table_field_columns``,
crates/modelardb_storage/src/data_folder/mod.rs:415-520), holding table
kind, query schema, per-field error bounds, and generated-column
expressions.

Stored as a VERSIONED JSON document ``tables.<version>.json`` under
``<data folder>/metadata/``: every mutation re-reads the latest version,
applies the change, and publishes the next version with an atomic
create-exclusive — the same optimistic CAS the transaction log uses
(sources/txlog.py), so two concurrent CREATE TABLEs from different
processes can never silently drop each other (a plain overwrite of one
shared file would be last-writer-wins). Readers just load the highest
version; superseded versions are pruned best-effort after a commit.
A legacy un-versioned ``tables.json`` (pre-CAS folders) is read as the
base version. All I/O goes through the Hadoop FileSystem API so the
metadata directory may be any URI the session can reach (``file://``,
``s3a://``, ...).
"""

from __future__ import annotations

import json
import re
import threading

from pyspark.sql import types as T

from modelardb_rs_spark.sources.hadoopfs import HadoopFS
from modelardb_rs_spark.types import TableKind, TimeSeriesTableMetadata

_VERSION_RE = re.compile(r"tables\.(\d{20})\.json$")
_KEEP_VERSIONS = 8
_MAX_COMMIT_ATTEMPTS = 100


class Catalog:
    def __init__(self, metadata_dir: str, fs: HadoopFS) -> None:
        self._fs = fs
        self._dir = metadata_dir
        self._legacy_path = fs.join(metadata_dir, "tables.json")
        self._lock = threading.Lock()
        # Versioned catalog files are immutable (create-exclusive), so
        # the payload can be cached per version; freshness still comes
        # from the directory listing every _latest() performs. Bytes are
        # cached (not the parsed doc) because _commit mutates the doc it
        # gets back.
        self._payload_cache: tuple[int, bytes] | None = None
        fs.mkdirs(metadata_dir)

    def _versioned(self, version: int) -> str:
        return self._fs.join(self._dir, f"tables.{version:020d}.json")

    def _latest(self) -> tuple[int, dict]:
        """(version, doc) of the newest catalog version; -1 + legacy file
        (or an empty catalog) when no versioned file exists yet."""
        best = -1
        best_stamp = None
        for info in self._fs.list(self._dir):
            m = _VERSION_RE.search(info.path.rsplit("/", 1)[-1])
            if m and int(m.group(1)) > best:
                best = int(m.group(1))
                best_stamp = (info.size, info.mtime_ms)
        if best >= 0:
            # validated by the listing's (size, mtime) stamp, so a folder
            # recreated at the same path (version numbers restart) never
            # serves stale bytes
            cached = self._payload_cache
            if cached is not None and cached[0] == (best, best_stamp):
                payload = cached[1]
            else:
                payload = self._fs.read_bytes(self._versioned(best))
                self._payload_cache = ((best, best_stamp), payload)
            return best, json.loads(payload.decode("utf-8"))
        if self._fs.exists(self._legacy_path):
            return -1, json.loads(self._fs.read_bytes(self._legacy_path).decode("utf-8"))
        return -1, {"tables": {}}

    def _load(self) -> dict:
        return self._latest()[1]

    def _commit(self, mutate) -> None:
        """Optimistic CAS: re-apply `mutate(doc)` to a fresh snapshot
        until the next-version publish wins. `mutate` re-raises its
        not-applicable errors (duplicate name, missing table) against the
        CURRENT state, so losers of a race fail for the right reason."""
        with self._lock:  # in-process serialization; CAS handles cross-process
            for _ in range(_MAX_COMMIT_ATTEMPTS):
                version, doc = self._latest()
                mutate(doc)
                payload = json.dumps(doc, indent=1).encode("utf-8")
                if self._fs.create_exclusive(self._versioned(version + 1), payload):
                    self._prune(version + 1)
                    return
            raise RuntimeError(
                f"could not commit catalog update after {_MAX_COMMIT_ATTEMPTS} attempts"
            )

    def _prune(self, latest: int) -> None:
        """Best-effort deletion of long-superseded versions (concurrent
        readers of a recent version are protected by the keep window)."""
        try:
            for info in self._fs.list(self._dir):
                m = _VERSION_RE.search(info.path.rsplit("/", 1)[-1])
                if m and int(m.group(1)) <= latest - _KEEP_VERSIONS:
                    self._fs.delete(info.path)
        except Exception:
            pass

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
        def mutate(doc: dict) -> None:
            if name in doc["tables"]:
                raise ValueError(f"table {name!r} already exists")
            doc["tables"][name] = {"kind": TableKind.NORMAL.value, "schema": schema.json()}

        self._commit(mutate)

    def add_time_series_table(self, meta: TimeSeriesTableMetadata) -> None:
        def mutate(doc: dict) -> None:
            if meta.name in doc["tables"]:
                raise ValueError(f"table {meta.name!r} already exists")
            doc["tables"][meta.name] = {
                "kind": TableKind.TIME_SERIES.value,
                "metadata": meta.to_json(),
            }

        self._commit(mutate)

    def drop(self, name: str) -> None:
        def mutate(doc: dict) -> None:
            if name not in doc["tables"]:
                raise KeyError(f"table {name!r} does not exist")
            del doc["tables"][name]

        self._commit(mutate)

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
