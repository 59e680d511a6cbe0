"""Edge→cloud data transfer — ship compressed segments from a local
data folder to a remote one.

Reference: ``DataTransfer``
(crates/modelardb_server/src/storage/data_transfer.rs:40-258): per-table
byte sizes are tracked, and when a table passes the batch-size threshold
(or a periodic timer fires) its compressed files move to the remote
object store and are deleted locally. Dropped tables are skipped.

Spark-first differences:

- table sizes come straight from the transaction log's committed file
  sizes (exact, no per-file HEAD requests — the reference loops
  ``object_store.head`` per file),
- the move is two transactions: an atomic append of the snapshot's
  segments to the remote table, then an atomic removal of exactly those
  files from the local live set — writes that land mid-transfer stay
  local and ship with the next batch (the reference deletes whole files
  after upload with the same per-file granularity),
- the remote side is any ``DataFolder``-compatible root (``s3a://`` etc.
  via the session's Hadoop config), matching open_s3/open_azure.
"""

from __future__ import annotations

import threading

from modelardb_rs_spark.engine import Engine
from modelardb_rs_spark.types import TableKind


class DataTransfer:
    def __init__(
        self,
        local: Engine,
        remote: Engine,
        transfer_batch_size_in_bytes: int | None = None,
    ) -> None:
        self.local = local
        self.remote = remote
        self.transfer_batch_size_in_bytes = transfer_batch_size_in_bytes
        self.dropped_tables: set[str] = set()
        self._timer: threading.Timer | None = None
        # transfer immediately for tables already over the threshold
        if transfer_batch_size_in_bytes is not None:
            self.transfer_larger_than_threshold(transfer_batch_size_in_bytes)

    # ------------------------------------------------------------- sizes

    def table_size_in_bytes(self, name: str) -> int:
        """Current committed bytes for a table, from the transaction log."""
        snap = self.local.folder.log(name).snapshot()
        return sum(f.get("size", 0) for f in snap.files)

    # ---------------------------------------------------------- triggers

    def check_table(self, name: str) -> None:
        """Call after a write: transfers the table if it crossed the
        batch-size threshold (reference increase_table_size)."""
        if (
            self.transfer_batch_size_in_bytes is not None
            and self.table_size_in_bytes(name) >= self.transfer_batch_size_in_bytes
        ):
            self.transfer_data(name)

    def transfer_larger_than_threshold(self, threshold: int) -> None:
        for name, kind in self.local.catalog.tables().items():
            if kind == TableKind.TIME_SERIES and self.table_size_in_bytes(name) > threshold:
                self.transfer_data(name)

    def set_transfer_time_in_seconds(self, seconds: int | None) -> None:
        """(Re)start or stop the periodic transfer task."""
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None
        if seconds is None:
            return

        def tick() -> None:
            self.transfer_larger_than_threshold(0)
            self.set_transfer_time_in_seconds(seconds)

        self._timer = threading.Timer(seconds, tick)
        self._timer.daemon = True
        self._timer.start()

    def mark_table_as_dropped(self, name: str) -> None:
        self.dropped_tables.add(name)

    def clear_table(self, name: str) -> int:
        self.dropped_tables.discard(name)
        return self.table_size_in_bytes(name)

    # ---------------------------------------------------------- transfer

    def transfer_data(self, name: str) -> int:
        """Move the table's current committed segments to the remote
        folder; returns the number of files shipped."""
        if name in self.dropped_tables:
            return 0
        meta = self.local.catalog.time_series_metadata(name)
        if name not in self.remote.catalog.tables():
            self.remote.create_time_series_table(meta)
        snap = self.local.folder.log(name).snapshot()
        if not snap.files:
            return 0
        segments = self.local.folder.read_segments(meta, version=snap.version)
        self.remote.folder.write_segments(meta, segments)
        self.local.folder.remove_files(name, snap.paths)
        return len(snap.files)
