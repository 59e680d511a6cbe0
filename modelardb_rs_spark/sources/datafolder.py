"""Data-folder storage layer: transactional Parquet under one root URI.

Reference: the Delta Lake "data folder" (tables/ + metadata/,
crates/modelardb_storage/src/data_folder/mod.rs:89-686 and
delta_table_writer.rs:42-110). The container has no Delta jars, so the
same guarantees come from a per-table JSON transaction log
(sources/txlog.py): atomic ACID appends, snapshot-isolated reads,
transactional TRUNCATE, VACUUM with a retention window, and time-travel
reads by version or timestamp.

    <root>/metadata/tables.json          catalog (catalog.py)
    <root>/tables/<name>/
        _txn/<version>.json              commit log
        txn=<uuid>/...                   one staged dir per committed write
            field_column=N/...parquet    ts tables: partitioned by field

All path operations go through the Hadoop FileSystem API
(sources/hadoopfs.py), so the root can be a local path, ``file://`` URI,
or an object-store scheme (``s3a://`` etc.) configured on the session —
reference open_s3/open_azure parity.

Segment writes stay sorted within partitions by (tags..., start_time)
exactly like the reference writer (delta_table_writer.rs:66-80), so
Parquet row-group min/max statistics on start_time/end_time stay tight
and time-range scans prune well. The staged directory is itself a
``txn=<uuid>`` Hive-style level, which keeps ``field_column`` a real
partition column for pruning while giving every commit a collision-free
namespace.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modelardb_rs_spark.sources.hadoopfs import HadoopFS
from modelardb_rs_spark.sources.txlog import TransactionLog
from modelardb_rs_spark.types import TimeSeriesTableMetadata, segment_schema

# Reference VACUUM default: 7-day retention (data_folder/mod.rs:582-686).
DEFAULT_RETENTION_SECONDS = 7 * 24 * 3600

# Files at or above this fraction of the target are already "right-sized"
# and never rewritten by OPTIMIZE (Delta uses the same idea: minFileSize).
_OPTIMIZE_SMALL_FRACTION = 0.75

# Commits staging more files than this compute their per-file stats with
# one distributed job instead of driver-side footer reads.
_DRIVER_STATS_MAX_FILES = 64


class ConcurrentModificationError(RuntimeError):
    """A transactional rewrite lost a race: files it read were removed
    from the live set before it could commit. Retry against the new
    snapshot."""


def _parquet_segment_stats(fs: HadoopFS, uri: str, size: int) -> dict | None:
    """Per-file stats from the Parquet FOOTER plus three tiny columns —
    no Spark job. ``file:`` URIs read via pyarrow directly; other
    schemes go through a seekable Hadoop stream. Returns
    ``{"span": (min start_time, max end_time) | None,
       "all_fast": bool | None,
       "fast_points": int | None, "total_points": int | None}``.
    ``all_fast`` means every segment in the file is JVM-reconstructable
    (max model_type_id < GORILLA and max ts_kind == 0) so readers can
    drop the Python decode branch; ``fast_points``/``total_points`` are
    the decoded-point counts per branch (sum of value_count), letting
    readers drop the JVM branch when fast points are negligible — each
    extra branch is an extra scan of the segment files.
    Returns None (conservative) when the footer is unreadable."""
    import pyarrow.parquet as pq

    stream = None
    try:
        if uri.startswith("file:"):
            from urllib.parse import urlparse

            pf = pq.ParquetFile(urlparse(uri).path)
        else:
            stream = fs.open_seekable(uri, size)
            pf = pq.ParquetFile(stream)
        md = pf.metadata
    except Exception:
        if stream is not None:
            stream.close()
        return None
    lo = hi = None
    max_model = max_ts_kind = None
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            if col.path_in_schema == "start_time":
                lo = st.min if lo is None else min(lo, st.min)
            elif col.path_in_schema == "end_time":
                hi = st.max if hi is None else max(hi, st.max)
            elif col.path_in_schema == "model_type_id":
                max_model = st.max if max_model is None else max(max_model, st.max)
            elif col.path_in_schema == "ts_kind":
                max_ts_kind = st.max if max_ts_kind is None else max(max_ts_kind, st.max)
    from modelardb_rs_spark.types import GORILLA_ID

    all_fast = None
    if max_model is not None and max_ts_kind is not None:
        all_fast = bool(int(max_model) < GORILLA_ID and int(max_ts_kind) == 0)
    fast_points = total_points = None
    try:
        # Three narrow columns (two int8, one int32) — a few KB even for
        # files holding 100k+ segments; the file handle is already open.
        tbl = pf.read(columns=["model_type_id", "ts_kind", "value_count"])
        import pyarrow.compute as pc

        counts = tbl.column("value_count")
        fast_mask = pc.and_(
            pc.less(tbl.column("model_type_id"), GORILLA_ID),
            pc.equal(pc.fill_null(tbl.column("ts_kind"), 1), 0),
        )
        total_points = int(pc.sum(counts).as_py() or 0)
        fast_points = int(
            pc.sum(pc.if_else(pc.fill_null(fast_mask, False), counts, 0)).as_py() or 0
        )
    except Exception:
        pass
    finally:
        if stream is not None:
            stream.close()
    return {
        "span": (int(lo), int(hi)) if lo is not None and hi is not None else None,
        "all_fast": all_fast,
        "fast_points": fast_points,
        "total_points": total_points,
    }


def _parquet_num_rows(fs: HadoopFS, uri: str, size: int) -> int | None:
    """Row count from the Parquet footer — a KB-sized ranged read, no
    Spark job. Returns None (conservative) when unreadable. Recorded in
    every normal-table add entry so readers can answer count-shaped
    questions (e.g. the ANN index's per-bucket sizes, which pair the
    count with the ``ivf_bucket=`` partition value in the path) from
    the commit log alone — zero jobs, zero file scans."""
    import pyarrow.parquet as pq

    stream = None
    try:
        if uri.startswith("file:"):
            from urllib.parse import urlparse

            pf = pq.ParquetFile(urlparse(uri).path)
        else:
            stream = fs.open_seekable(uri, size)
            pf = pq.ParquetFile(stream)
        return int(pf.metadata.num_rows)
    except Exception:
        return None
    finally:
        if stream is not None:
            stream.close()


class DataFolder:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.fs = HadoopFS(spark, root)
        self.root = self.fs.base
        self.tables_dir = self.fs.join(self.root, "tables")
        self.metadata_dir = self.fs.join(self.root, "metadata")
        self.fs.mkdirs(self.tables_dir)
        self.fs.mkdirs(self.metadata_dir)
        self._logs: dict[str, TransactionLog] = {}
        self._df_cache: dict[tuple, DataFrame] = {}

    def table_path(self, name: str) -> str:
        return self.fs.join(self.tables_dir, name)

    def log(self, name: str) -> TransactionLog:
        if name not in self._logs:
            self._logs[name] = TransactionLog(self.fs, self.table_path(name))
        return self._logs[name]

    def mirror_healthy(self, name: str) -> bool:
        """Whether table ``name``'s stock-Delta mirror is still being
        maintained (see TransactionLog.mirror_healthy). A False here
        means external Delta readers are pinned at an old version while
        this engine keeps working — check after VACUUM with aggressive
        retention or any storage-level surgery on ``_txn`` history."""
        return self.log(name).mirror_healthy

    def _has_data(self, name: str) -> bool:
        return bool(self.log(name).snapshot().files)

    # -------------------------------------------------------- write/commit

    def _stage_and_commit(
        self,
        name: str,
        write_staged,
        op: str = "append",
        segment_stats: bool = False,
        remove: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        replace_expected: list[str] | None = None,
        commit_meta: dict | None = None,
        expected_meta: tuple[str, object] | None = None,
    ) -> int | None:
        """Run `write_staged(staged_uri)` into a fresh txn= directory,
        then commit the produced parquet files atomically.

        With ``segment_stats`` each add-entry also records the file's
        field_column (from the partition path) and min/max time span —
        Delta-style data skipping: readers prune files driver-side from
        the log before Spark ever lists or opens them. Spans come from
        the Parquet FOOTERS (KB-sized ranged reads, threaded across
        files), not a Spark job — commit latency stays flat no matter
        how wide the table is.

        ``remove`` lists rel-paths this commit replaces (OPTIMIZE). The
        commit aborts if any of them left the live set concurrently —
        re-adding their data then would resurrect truncated/compacted
        rows (Delta's ConcurrentDeleteReadException semantics).

        ``expected_meta=(key, value)`` makes the commit conditional on
        the snapshot's meta payload still carrying ``value`` under
        ``key`` at commit time — the guard for writes whose CONTENT was
        derived from the meta (an ANN append assigns vectors against
        the centroids in the meta; if a rebuild swaps them mid-flight
        the staged rows belong to a geometry that no longer exists, so
        the commit must abort and the caller re-derive). Checked on
        every optimistic-retry snapshot, like ``replace_expected``.

        ``commit_meta`` may be a CALLABLE: it is invoked once with the
        staged ADD-ENTRY list (paths, sizes, and — for normal tables —
        per-file ``num_rows``), after the staged write job has run and
        before the commit, and must return the meta dict. This is the
        hook that lets a meta payload incorporate statistics of the
        write itself: the ANN builds derive their per-bucket counts
        from the entries' ``num_rows`` + ``ivf_bucket=`` path values,
        saving the separate counts pass the eager form required."""
        table = self.table_path(name)
        staged_rel = f"txn={uuid.uuid4().hex[:16]}"
        staged = self.fs.join(table, staged_rel)
        write_staged(staged)
        add = []
        for info in self.fs.list_files_recursive(staged):
            if not info.path.endswith(".parquet"):
                continue
            rel = staged_rel + info.path.split(staged_rel, 1)[1]
            entry = {"path": rel, "size": info.size}
            m = re.search(r"field_column=(\d+)/", rel)
            if m:
                entry["field_column"] = int(m.group(1))
            add.append(entry)
        if segment_stats and add:
            if len(add) > _DRIVER_STATS_MAX_FILES:
                # wide commit: ONE distributed job computes every file's
                # stats (narrow columns only) — the driver reading
                # thousands of footers serially would become the commit
                # bottleneck on a real cluster
                stats = self._segment_stats_job(staged, staged_rel, add)
            else:
                def stats_of(entry: dict):
                    return _parquet_segment_stats(
                        self.fs, self.fs.join(table, entry["path"]), entry["size"]
                    )

                if len(add) == 1:
                    stats = [stats_of(add[0])]
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(min(16, len(add))) as pool:
                        stats = list(pool.map(stats_of, add))
            for entry, st in zip(add, stats):
                if st is None:
                    continue
                if st["span"] is not None:
                    entry["min_start_time"], entry["max_end_time"] = st["span"]
                if st["all_fast"] is not None:
                    entry["all_fast"] = st["all_fast"]
                if st.get("total_points") is not None:
                    entry["fast_points"] = st["fast_points"]
                    entry["total_points"] = st["total_points"]
        elif add:
            # normal tables: record each file's row count (one footer
            # ranged read per file, threaded — same flat-commit-latency
            # contract as the segment stats above)
            def rows_of(entry: dict):
                return _parquet_num_rows(
                    self.fs, self.fs.join(table, entry["path"]), entry["size"]
                )

            if len(add) == 1:
                n_rows = [rows_of(add[0])]
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(16, len(add))) as pool:
                    n_rows = list(pool.map(rows_of, add))
            for entry, n in zip(add, n_rows):
                if n is not None:
                    entry["num_rows"] = n
        if callable(commit_meta):
            commit_meta = commit_meta(add)
        remove_set = set(remove or [])
        expected_set = set(replace_expected) if replace_expected is not None else None

        def build(snap):
            if expected_meta is not None:
                mk, mv = expected_meta
                cur = (snap.meta or {}).get(mk)
                if cur != mv:
                    raise ConcurrentModificationError(
                        f"{name}: commit meta[{mk!r}] changed concurrently "
                        f"({mv!r} -> {cur!r}); the staged write was derived "
                        "from superseded metadata — re-derive and retry"
                    )
            if expected_set is not None:
                # full-replace commit: the staged data was computed FROM
                # expected_set, so ANY concurrent change to the live set
                # (an append's add as much as a remove) would be silently
                # dropped by the replace — abort instead
                live = set(snap.paths)
                if live != expected_set:
                    delta = len(live ^ expected_set)
                    raise ConcurrentModificationError(
                        f"{name}: live file set changed concurrently "
                        f"({delta} file(s) differ from the snapshot the "
                        "replacement was computed from); re-run the rebuild"
                    )
                if commit_meta is not None:
                    return (op, add, sorted(live), commit_meta)
                return (op, add, sorted(live))
            gone = remove_set - set(snap.paths)
            if gone:
                raise ConcurrentModificationError(
                    f"{name}: {len(gone)} input file(s) were removed concurrently "
                    f"(e.g. {sorted(gone)[0]}); retry the operation"
                )
            if commit_meta is not None:
                return (op, add, sorted(remove_set), commit_meta)
            return (op, add, sorted(remove_set))

        committed = self.log(name).commit(build, txn=txn)
        if committed is None:
            # txn already applied (at-least-once replay lost the race):
            # the staged files are orphans no commit references; delete
            # them now rather than waiting for vacuum
            try:
                self.fs.delete(staged, recursive=True)
            except Exception:
                pass
        return committed

    # -------------------------------------------------------- read helpers

    _DF_CACHE_MAX = 256

    def _segment_stats_job(
        self, staged: str, staged_rel: str, add: list[dict]
    ) -> list[dict | None]:
        """Per-file commit stats via one Spark job over the staged
        directory: group by input_file_name over FIVE narrow columns.
        Same outputs as _parquet_segment_stats, computed where the data
        lives — commit latency stays flat no matter how many files one
        transaction stages."""
        from modelardb_rs_spark.types import GORILLA_ID

        df = self.spark.read.parquet(staged)
        fast = (
            (F.col("model_type_id") < F.lit(GORILLA_ID))
            & (F.coalesce(F.col("ts_kind"), F.lit(1)) == F.lit(0))
        )
        rows = (
            df.groupBy(F.input_file_name().alias("__f__"))
            .agg(
                F.min("start_time").alias("lo"),
                F.max("end_time").alias("hi"),
                F.max("model_type_id").alias("mm"),
                F.max(F.coalesce(F.col("ts_kind"), F.lit(1))).alias("mk"),
                F.sum("value_count").alias("tp"),
                F.sum(F.when(fast, F.col("value_count")).otherwise(F.lit(0))).alias("fp"),
            )
            .collect()
        )
        by_rel: dict[str, dict] = {}
        marker = staged_rel + "/"
        for r in rows:
            fname = r["__f__"]
            idx = fname.find(marker)
            if idx < 0:
                continue
            by_rel[fname[idx:]] = {
                "span": (int(r["lo"]), int(r["hi"]))
                if r["lo"] is not None and r["hi"] is not None
                else None,
                "all_fast": bool(int(r["mm"]) < GORILLA_ID and int(r["mk"]) == 0)
                if r["mm"] is not None
                else None,
                "fast_points": int(r["fp"] or 0),
                "total_points": int(r["tp"] or 0),
            }
        return [by_rel.get(entry["path"]) for entry in add]

    def _read_live(self, name: str, snapshot, schema=None) -> DataFrame | None:
        """``schema`` (when the caller knows it, e.g. the segment layout)
        skips footer-based schema inference at plan time and null-fills
        columns absent from pre-upgrade files — at scale this avoids a
        driver-side footer read per snapshot.

        The resolved DataFrame is cached per (table, version, pruned
        path set): DataFrames are immutable plans, and data files under
        ``txn=`` staging are never rewritten in place, so the same live
        set always reads the same bytes — repeated queries skip the
        JVM-side DataSource resolution + file-index build entirely."""
        if not snapshot.files:
            return None
        table = self.table_path(name)
        paths = [self.fs.join(table, p) for p in snapshot.paths]
        key = (name, snapshot.version, hash(tuple(paths)), schema is not None)
        df = self._df_cache.get(key)
        if df is None:
            reader = self.spark.read.option("basePath", table)
            if schema is not None:
                reader = reader.schema(schema)
            df = reader.parquet(*paths)
            if len(self._df_cache) >= self._DF_CACHE_MAX:
                self._df_cache.clear()
            self._df_cache[key] = df
        return df

    # -- segments (time series tables) -------------------------------------

    def write_segments(
        self,
        meta: TimeSeriesTableMetadata,
        segments: DataFrame,
        txn: tuple[str, int] | None = None,
    ) -> int | None:
        """Atomically append segment rows, partitioned by field_column,
        sorted within partitions by (tags..., start_time). Returns the
        committed version, or None when a txn replay gate skipped the
        commit."""
        # No repartition: the compressor already co-located each series'
        # segments in one task; an extra shuffle here would double the
        # write cost. Sorting by (field_column, tags..., start_time) keeps
        # one open Parquet writer at a time per dynamic partition and tight
        # row-group stats within each file.
        sort_cols = ["field_column", *meta.tag_columns, "start_time"]

        def write_staged(staged: str) -> None:
            (
                segments.sortWithinPartitions(*sort_cols)
                .write.partitionBy("field_column")
                # the reference fixes ZSTD for segment storage
                # (modelardb_storage/src/lib.rs:255); ~20-40% smaller than
                # snappy on codec payloads at negligible decode cost
                .option("compression", "zstd")
                .parquet(staged)
            )

        return self._stage_and_commit(
            meta.name, write_staged, segment_stats=True, txn=txn
        )

    def limit_time_cutoff(self, name: str, n: int) -> int | None:
        """Inclusive end-time cutoff S (µs) such that reading only
        points with timestamp <= S is guaranteed to reconstruct at
        least ``n`` rows — the LIMIT-pushdown bound (reference pushes
        LIMIT into the scan, time_series_table.rs:447 +
        grid_exec.rs:239-246).

        Driver-side over commit-log file stats, no I/O: walk files in
        ``max_end_time`` order accumulating per-field ``total_points``;
        the first S where ANY single field's accumulated count reaches
        ``n`` works, because every reconstructed row at a timestamp
        carries at least that field's multiplicity there — so rows with
        ts <= S >= that field's point count <= S >= n. Unstatted files
        are skipped conservatively (they can only ADD rows under S).
        Returns None when stats can't prove ``n`` rows (small table,
        missing stats) — caller scans everything."""
        statted = [
            f
            for f in self.log(name).snapshot().files
            if f.get("max_end_time") is not None and f.get("total_points")
        ]
        statted.sort(key=lambda f: f["max_end_time"])
        acc: dict[int | None, int] = {}
        for f in statted:
            fc = f.get("field_column")
            acc[fc] = acc.get(fc, 0) + f["total_points"]
            if acc[fc] >= n:
                return f["max_end_time"]
        return None

    def read_segments(
        self,
        meta: TimeSeriesTableMetadata,
        version: int | None = None,
        timestamp_ms: int | None = None,
        start_us: int | None = None,
        end_us: int | None = None,
        field_indexes: list[int] | None = None,
        with_info: bool = False,
    ) -> DataFrame:
        """Snapshot-isolated segment read; `version`/`timestamp_ms` select
        an older snapshot (time travel). `start_us`/`end_us`/
        `field_indexes` prune files driver-side from the per-file stats
        recorded at commit time — at scale a narrow time range touches a
        handful of files out of millions without a single LIST call.
        Files lacking stats are conservatively kept, and the exact
        predicates are re-applied by the caller, so skipping is always
        semantics-preserving.

        ``with_info=True`` returns ``(df, info)`` where
        ``info["may_have_slow"]`` is False only when every live file's
        commit-log stats prove all segments are JVM-reconstructable
        (model-typed, regular timestamps) — the grid view then omits the
        Python decode branch from the plan entirely.
        ``info["fast_fraction"]`` is the fraction of points decodable by
        the JVM fast path, from commit-log point counts (None when any
        live file lacks them) — the grid view drops the JVM branch (and
        its second scan of the segment files) when it's negligible."""
        schema = segment_schema(meta.tag_columns)
        snap = self.log(meta.name).snapshot(version, timestamp_ms)
        if start_us is not None or end_us is not None or field_indexes is not None:
            fields = set(field_indexes) if field_indexes is not None else None

            def keep(f: dict) -> bool:
                if fields is not None and f.get("field_column") is not None:
                    if f["field_column"] not in fields:
                        return False
                lo, hi = f.get("min_start_time"), f.get("max_end_time")
                if lo is None or hi is None:
                    return True
                if start_us is not None and hi < start_us:
                    return False
                if end_us is not None and lo > end_us:
                    return False
                return True

            snap.files = [f for f in snap.files if keep(f)]
        may_have_slow = any(not f.get("all_fast", False) for f in snap.files)
        fast_fraction = None
        if snap.files and all(f.get("total_points") is not None for f in snap.files):
            total = sum(f["total_points"] for f in snap.files)
            fast = sum(f["fast_points"] for f in snap.files)
            fast_fraction = (fast / total) if total else 1.0
        df = self._read_live(meta.name, snap, schema=schema)
        if df is None:
            df = self.spark.createDataFrame([], schema)
        else:
            # partition discovery types field_column as int (and adds the
            # txn staging column); restore int16, null-fill fast-path
            # columns absent from pre-upgrade files, and restore the
            # declared column set
            df = df.withColumn("field_column", F.col("field_column").cast("short"))
            for f in schema.fields:
                if f.name not in df.columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            df = df.select(*[f.name for f in schema.fields])
        info = {
            "may_have_slow": may_have_slow,
            "fast_fraction": fast_fraction,
            "version": snap.version,
            "n_files": len(snap.files),
            "paths_hash": hash(tuple(sorted(snap.paths))),
        }
        return (df, info) if with_info else df

    # -- normal tables ------------------------------------------------------

    def write_normal(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        commit_meta: dict | None = None,
        expected_meta: tuple[str, object] | None = None,
    ) -> int | None:
        """Atomically append rows to a normal table. Returns the
        committed version, or None when a txn replay gate skipped the
        commit. ``partition_by``
        lays the files out Hive-style on those columns, so equality/IN
        filters on them prune whole directories at planning time (the
        ANN index stores vectors partitioned by bucket this way).
        ``txn=(app_id, version)`` records a SetTransaction-style replay
        gate atomically with the append (see TransactionLog.commit).
        ``commit_meta`` attaches an application metadata payload to the
        same commit (Snapshot.meta)."""

        def write_staged(staged: str) -> None:
            writer = df.write.option("compression", "zstd")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(staged)

        return self._stage_and_commit(
            name, write_staged, txn=txn, commit_meta=commit_meta,
            expected_meta=expected_meta,
        )

    def replace_normal(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        expected_paths: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        commit_meta: dict | None = None,
    ) -> int:
        """Atomically REPLACE a normal table's entire live file set in
        ONE commit (the Delta overwrite analog): readers resolve either
        the old snapshot or the new one, never an empty or partial
        table — the availability contract an index rebuild needs (a
        drop + recreate leaves a window where the table is missing).
        Old files stay on disk for time travel until VACUUM, like any
        other remove.

        ``expected_paths`` (default: the live set at call time) makes
        the replace CONDITIONAL: the commit aborts with
        ConcurrentModificationError if the live set no longer equals
        the snapshot the replacement was computed from — a concurrent
        append's rows would otherwise be silently dropped. Callers
        re-run the rebuild on conflict (snapshot-isolation semantics,
        same contract the reference's transactional folder gives
        rewrites, modelardb_storage/src/data_folder/mod.rs)."""
        if expected_paths is None:
            expected_paths = list(self.log(name).snapshot().paths)

        def write_staged(staged: str) -> None:
            writer = df.write.option("compression", "zstd")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(staged)

        return self._stage_and_commit(
            name, write_staged, op="replace", replace_expected=expected_paths,
            txn=txn, commit_meta=commit_meta,
        )

    def last_txn_version(self, name: str, app_id: str) -> int | None:
        """Latest application-transaction version recorded for
        ``app_id`` on table ``name`` (None if never recorded) — the
        cheap pre-check streaming sinks use to skip a replayed epoch
        before launching any Spark job."""
        return self.log(name).snapshot().txns.get(app_id)

    def read_normal(
        self,
        name: str,
        schema,
        version: int | None = None,
        timestamp_ms: int | None = None,
    ) -> DataFrame:
        snap = self.log(name).snapshot(version, timestamp_ms)
        df = self._read_live(name, snap, schema=schema)
        if df is None:
            return self.spark.createDataFrame([], schema)
        return df.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])

    # -- maintenance ---------------------------------------------------------

    def optimize(
        self,
        name: str,
        target_file_bytes: int = 128 << 20,
        meta: TimeSeriesTableMetadata | None = None,
    ) -> dict:
        """Compact small live files into ~target-sized ones in ONE
        transactional commit (Delta OPTIMIZE / bin-packing analog).
        Streaming ingest necessarily writes many small commits; at scale
        the resulting file count — not the byte count — dominates scan
        planning and open() overhead, so compaction is what keeps a
        frequently-appended table scannable. Old files stay on disk for
        time travel until VACUUM, exactly like any other remove.

        Pass ``meta`` for time series tables: the rewrite then keeps the
        field_column partitioning and the (tags, start_time) sort order,
        and RANGE-partitions the output on (field_column, start_time) —
        ingest's volume-bucketed shuffle hash-scatters time buckets
        across files (wide per-file time spans), whereas compacted files
        become near-disjoint time slices, so commit-log span pruning
        skips almost everything outside a query's range and later
        ``expire`` calls hit the metadata-only path (the Delta
        OPTIMIZE+ZORDER-by-time analog; repartitionByRange's sampling
        pass is fine in a maintenance op). Returns
        ``{"compacted", "produced", "version"}``.
        """
        snap = self.log(name).snapshot()
        small = [
            f
            for f in snap.files
            if f["size"] < target_file_bytes * _OPTIMIZE_SMALL_FRACTION
        ]
        if len(small) < 2:
            return {"compacted": 0, "produced": 0, "version": snap.version}
        table = self.table_path(name)
        if meta is None:
            # Normal tables may be Hive-partitioned per write (the ANN
            # vectors tables lay out ivf_bucket= dirs for planning-time
            # pruning). The layout isn't cataloged, but it IS in every
            # live path — the col=value segments between the txn= level
            # and the file — so infer it BEFORE reading (a mixed-layout
            # multi-path read fails outright) and keep it: a flat
            # rewrite would strand partition values as in-file data
            # next to path-encoded ones and silently drop the pruning
            # the layout buys.
            schemes = {
                tuple(
                    seg.split("=", 1)[0]
                    for seg in f["path"].split("/")[1:-1]
                    if "=" in seg
                )
                for f in small
            }
            if len(schemes) != 1:
                # two writes disagreed on layout — refuse to guess; a
                # rebuild (not compaction) is the safe repair. WARN
                # rather than return silently: maybe_optimize re-tries
                # after every commit (the threshold stays crossed), so a
                # silent no-op here means the table's file count grows
                # forever with no signal to the operator.
                import logging

                logging.getLogger(__name__).warning(
                    "optimize(%s): live files carry %d different Hive "
                    "partition layouts (%s) — refusing to compact a mixed "
                    "layout; rewrite the table with one consistent "
                    "partition_by to restore compaction",
                    name,
                    len(schemes),
                    sorted(schemes),
                )
                return {
                    "compacted": 0,
                    "produced": 0,
                    "version": snap.version,
                    "mixed_layouts": sorted(schemes),
                }
            part_cols = list(schemes.pop())
        df = self.spark.read.option("basePath", table).parquet(
            *[self.fs.join(table, f["path"]) for f in small]
        )
        n_out = max(1, -(-sum(f["size"] for f in small) // target_file_bytes))
        if meta is not None:
            sort_cols = ["field_column", *meta.tag_columns, "start_time"]

            def write_staged(staged: str) -> None:
                (
                    df.repartitionByRange(n_out, F.col("field_column"), F.col("start_time"))
                    .sortWithinPartitions(*sort_cols)
                    .write.partitionBy("field_column")
                    .parquet(staged)
                )

        else:
            if part_cols:

                def write_staged(staged: str) -> None:
                    (
                        df.drop("txn")
                        .repartition(n_out, *[F.col(c) for c in part_cols])
                        .write.partitionBy(*part_cols)
                        .parquet(staged)
                    )

            else:

                def write_staged(staged: str) -> None:
                    df.repartition(n_out).write.parquet(staged)

        removed = [f["path"] for f in small]
        version = self._stage_and_commit(
            name,
            write_staged,
            op="optimize",
            segment_stats=meta is not None,
            remove=removed,
        )
        produced = len(self.log(name).read_commit(version).get("add", []))
        return {"compacted": len(small), "produced": produced, "version": version}

    def expire_segments_before(
        self,
        meta: TimeSeriesTableMetadata,
        cutoff_us: int,
        not_before_us: int | None = None,
    ) -> dict:
        """Transactional time-range retention (DELETE WHERE timestamp <
        cutoff, or WHERE not_before <= timestamp < cutoff when a lower
        bound is given) — see operators/retention.py for the three cost
        classes. Files entirely inside the deletion window are removed
        metadata-only from the commit-log stats; boundary files are
        rewritten (verbatim for fully-kept segments, lossless re-encode
        for straddlers); one atomic commit covers both. Concurrent
        appends are untouched. The lower bound exists for policies that
        must preserve late-arriving points below an already-processed
        watermark (Engine.downsample_expire). Returns
        {"files_removed", "files_rewritten", "version"}."""
        from modelardb_rs_spark.operators.retention import split_boundary_segments

        name = meta.name
        snap = self.log(name).snapshot()
        old, boundary = [], []
        for f in snap.files:
            lo, hi = f.get("min_start_time"), f.get("max_end_time")
            fully_inside = (
                hi is not None
                and hi < cutoff_us
                and (not_before_us is None or (lo is not None and lo >= not_before_us))
            )
            untouched = (lo is not None and lo >= cutoff_us) or (
                not_before_us is not None and hi is not None and hi < not_before_us
            )
            if fully_inside:
                old.append(f["path"])
            elif not untouched:
                # conservative: stats-less files go through the rewrite,
                # which keeps fully-outside segments verbatim
                boundary.append(f["path"])
        if not old and not boundary:
            return {"files_removed": 0, "files_rewritten": 0, "version": snap.version}
        if not boundary:
            old_set = set(old)

            def build(s):
                gone = old_set - set(s.paths)
                if gone:
                    raise ConcurrentModificationError(
                        f"{name}: {len(gone)} file(s) to expire were removed "
                        f"concurrently; retry"
                    )
                return ("expire", [], sorted(old_set))

            version = self.log(name).commit(build)
            return {"files_removed": len(old), "files_rewritten": 0, "version": version}

        table = self.table_path(name)
        schema = segment_schema(meta.tag_columns)
        df = self.spark.read.option("basePath", table).parquet(
            *[self.fs.join(table, p) for p in boundary]
        )
        df = df.withColumn("field_column", F.col("field_column").cast("short"))
        for fld in schema.fields:
            if fld.name not in df.columns:
                df = df.withColumn(fld.name, F.lit(None).cast(fld.dataType))
        df = df.select(*[fld.name for fld in schema.fields])
        kept = split_boundary_segments(df, meta.tag_columns, cutoff_us, not_before_us)
        sort_cols = ["field_column", *meta.tag_columns, "start_time"]

        def write_staged(staged: str) -> None:
            (
                kept.sortWithinPartitions(*sort_cols)
                .write.partitionBy("field_column")
                .option("compression", "zstd")
                .parquet(staged)
            )

        version = self._stage_and_commit(
            name, write_staged, op="expire", segment_stats=True,
            remove=old + boundary,
        )
        return {
            "files_removed": len(old),
            "files_rewritten": len(boundary),
            "version": version,
        }

    def resegment(self, meta: TimeSeriesTableMetadata) -> dict:
        """Merge overlapping segments created by out-of-order/backfill
        ingest (operators/retention.py::merge_overlapping_segments):
        clean series pass verbatim, overlapping series decode+refit
        lossless into disjoint segments; ONE transactional commit
        replaces the table's files (time-clustered like OPTIMIZE).
        Run it per retention window on a live system, not as one
        whole-history job. Returns {"files_before", "version"}."""
        from modelardb_rs_spark.operators.retention import merge_overlapping_segments

        name = meta.name
        snap = self.log(name).snapshot()
        if not snap.files:
            return {"files_before": 0, "version": snap.version}
        schema = segment_schema(meta.tag_columns)
        table = self.table_path(name)
        df = self.spark.read.option("basePath", table).parquet(
            *[self.fs.join(table, p) for p in snap.paths]
        )
        df = df.withColumn("field_column", F.col("field_column").cast("short"))
        for fld in schema.fields:
            if fld.name not in df.columns:
                df = df.withColumn(fld.name, F.lit(None).cast(fld.dataType))
        df = df.select(*[fld.name for fld in schema.fields])
        merged = merge_overlapping_segments(df, meta.tag_columns)
        sort_cols = ["field_column", *meta.tag_columns, "start_time"]

        def write_staged(staged: str) -> None:
            (
                merged.repartitionByRange(
                    max(1, len(snap.paths)), F.col("field_column"), F.col("start_time")
                )
                .sortWithinPartitions(*sort_cols)
                .write.partitionBy("field_column")
                .option("compression", "zstd")
                .parquet(staged)
            )

        version = self._stage_and_commit(
            name, write_staged, op="resegment", segment_stats=True,
            remove=list(snap.paths),
        )
        return {"files_before": len(snap.paths), "version": version}

    def truncate(self, name: str) -> None:
        """Transactional truncate: one commit removing every live file.
        Data files stay on disk for time travel until vacuumed
        (reference mod.rs:545-580 truncates the Delta table the same way)."""
        log = self.log(name)
        if not log.versions():
            return
        log.commit(lambda snap: ("truncate", [], snap.paths))

    def remove_files(self, name: str, rel_paths: list[str]) -> None:
        """Transactionally remove a specific set of files from the live
        set (used by edge→cloud transfer: only the transferred snapshot
        is dropped, so writes that landed mid-transfer survive)."""
        wanted = set(rel_paths)
        self.log(name).commit(
            lambda snap: ("transfer", [], [p for p in snap.paths if p in wanted])
        )

    def drop(self, name: str) -> None:
        """Physically remove the table directory, history included."""
        path = self.table_path(name)
        if self.fs.exists(path):
            self.fs.delete(path, recursive=True)
        self._logs.pop(name, None)

    def vacuum(
        self,
        name: str,
        retain_seconds: int | None = None,
        staging_grace_seconds: float | None = None,
    ) -> list[str]:
        """Delete files that left the live set before the retention
        horizon plus orphaned staging from crashed writes (reference
        data_folder/mod.rs:582-686). Returns deleted URIs. Aggressive
        retention can retire history the stock-Delta mirror still
        needed — check ``mirror_healthy(name)`` afterwards if external
        Delta readers depend on this table. Unreferenced staging sweeps
        on its own grace clock so a zero-retention vacuum cannot race a
        live writer's staging directory (TransactionLog.vacuum)."""
        if not self.fs.exists(self.table_path(name)):
            return []
        retain = DEFAULT_RETENTION_SECONDS if retain_seconds is None else retain_seconds
        return self.log(name).vacuum(retain, staging_grace_seconds=staging_grace_seconds)

    def history(self, name: str) -> list[dict]:
        """The table's commit history (version, op, timestamp, file
        counts) — the DESCRIBE HISTORY analog."""
        return [
            {
                "version": c["version"],
                "op": c["op"],
                "timestamp_ms": c["timestamp_ms"],
                "n_added": len(c.get("add", [])),
                "n_removed": len(c.get("remove", [])),
            }
            for c in self.log(name).commits()
        ]
