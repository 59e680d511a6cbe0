"""Time-range retention: ``DELETE FROM t WHERE timestamp < cutoff``.

The reference is append-only with TRUNCATE/VACUUM as the only bulk
maintenance (SURVEY §1.4); a 100 TB time-series store additionally
needs *retention* — "raw data older than N days expires, rollups stay".
This implements it transactionally on the segment store, in three cost
classes:

1. files whose commit-log ``max_end_time`` is before the cutoff are
   removed METADATA-ONLY — one log commit, zero data I/O. At scale this
   is the dominant case: steady ingest means almost every file is
   entirely inside or entirely outside the retention window.
2. segments inside boundary files that end before the cutoff are
   dropped by a filter; segments starting at/after the cutoff are kept
   verbatim (byte-identical rewrite).
3. only segments STRADDLING the cutoff — a handful per series — are
   decoded, truncated, and re-encoded LOSSLESS, so the kept points'
   query-visible values are exactly what they were before the expire
   (re-fitting with the original lossy bound could double the error;
   lossless re-encoding of the reconstruction cannot).

The whole expire is ONE atomic commit (adds + removes); concurrent
appends are untouched (only snapshot-listed files are removed, and the
commit aborts if a listed file was concurrently removed). Old files
stay on disk for time travel until VACUUM, like every other remove.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_rs_spark.compression.decode import decode_segments
from modelardb_rs_spark.compression.fitter import fit_series

from modelardb_rs_spark.types import ErrorBound, segment_schema


def refit_segments(
    segments: DataFrame,
    tag_columns: list[str],
    min_ts_us: int | None = None,
    drop_lo_us: int | None = None,
) -> DataFrame:
    """Decode segments per (field, series), optionally drop points in
    the deletion window (``[drop_lo_us, min_ts_us)`` when both are
    given, ``(-inf, min_ts_us)`` with only ``min_ts_us``), and refit
    LOSSLESS — the input values are themselves reconstructions, so
    lossless keeps them bit-stable. Arrow-batched; within each batch,
    one decode+fit per series. Used by retention (truncate-at-cutoff,
    ranged delete) and resegmentation (merge overlapping segments after
    out-of-order ingest)."""
    out_schema = segment_schema(tag_columns)
    group_cols = ["field_column", *tag_columns]

    def rewrite(batches):
        from modelardb_rs_spark.operators.compress import _assemble

        for pdf in batches:
            parts = []
            for keys, g in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(keys, tuple):
                    keys = (keys,)
                field_idx = int(keys[0])
                tag_values = {
                    t: (None if (isinstance(v, float) and np.isnan(v)) else v)
                    for t, v in zip(tag_columns, keys[1:])
                }
                pts = decode_segments(g, tag_columns)
                ts = pts["timestamp"].to_numpy()
                vals = pts["value"].to_numpy()
                if min_ts_us is not None:
                    mask = ts >= min_ts_us
                    if drop_lo_us is not None:
                        mask |= ts < drop_lo_us
                    ts, vals = ts[mask], vals[mask]
                if len(ts) == 0:
                    continue
                order = np.argsort(ts, kind="stable")
                cols = fit_series(ts[order], vals[order], ErrorBound.lossless())
                n = len(cols["model_type_id"])
                if n:
                    parts.append((cols, field_idx, tag_values, n))
            if parts:
                yield _assemble(parts, tag_columns)
            else:
                yield pd.DataFrame({f.name: [] for f in out_schema.fields})

    return segments.mapInPandas(rewrite, schema=out_schema)


def rewrite_straddling(
    straddling: DataFrame,
    tag_columns: list[str],
    cutoff_us: int,
    not_before_us: int | None = None,
) -> DataFrame:
    """Re-encode segments that straddle the deletion window: decode,
    drop points in [not_before, cutoff) (all points before the cutoff
    when ``not_before_us`` is None), refit lossless."""
    return refit_segments(
        straddling, tag_columns, min_ts_us=cutoff_us, drop_lo_us=not_before_us
    )


def split_boundary_segments(
    boundary: DataFrame,
    tag_columns: list[str],
    cutoff_us: int,
    not_before_us: int | None = None,
) -> DataFrame:
    """Segments of boundary files, partitioned by their relation to the
    deletion window [not_before, cutoff): fully-inside rows are
    dropped, fully-outside rows pass verbatim, straddling rows go
    through ``rewrite_straddling``. ``not_before_us=None`` is the plain
    retention cutoff (delete everything before)."""
    cut = F.lit(int(cutoff_us))
    if not_before_us is None:
        outside = F.col("start_time") >= cut
        inside = F.col("end_time") < cut
    else:
        lo = F.lit(int(not_before_us))
        outside = (F.col("start_time") >= cut) | (F.col("end_time") < lo)
        inside = (F.col("start_time") >= lo) & (F.col("end_time") < cut)
    keep_whole = boundary.where(outside)
    straddle = boundary.where(~outside & ~inside)
    return keep_whole.unionByName(
        rewrite_straddling(straddle, tag_columns, cutoff_us, not_before_us)
    )


def refit_series_grouped(dirty: DataFrame, tag_columns: list[str]) -> DataFrame:
    """Whole-series lossless refit: ``applyInPandas`` per
    (field_column, tags) group, so a series' segments are ALWAYS refit
    together — unlike ``refit_segments``' mapInPandas, whose Arrow
    batches (~10k rows) could split a many-segment series and refit it
    in independent pieces, leaving the output still overlapping.
    Memory per task is bounded by one series' segments (the price of
    the disjointness postcondition)."""
    out_schema = segment_schema(tag_columns)
    keys = ["field_column", *tag_columns]

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from modelardb_rs_spark.operators.compress import _assemble

        field_idx = int(pdf["field_column"].iloc[0])
        tag_values = {
            t: (None if pd.isna(v) else v)
            for t, v in ((t, pdf[t].iloc[0]) for t in tag_columns)
        }
        pts = decode_segments(pdf, tag_columns)
        ts = pts["timestamp"].to_numpy()
        vals = pts["value"].to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({f.name: [] for f in out_schema.fields})
        order = np.argsort(ts, kind="stable")
        cols = fit_series(ts[order], vals[order], ErrorBound.lossless())
        n = len(cols["model_type_id"])
        if not n:
            return pd.DataFrame({f.name: [] for f in out_schema.fields})
        return _assemble([(cols, field_idx, tag_values, n)], tag_columns)

    return dirty.groupBy(*keys).applyInPandas(fit_group, schema=out_schema)


def merge_overlapping_segments(segments: DataFrame, tag_columns: list[str]) -> DataFrame:
    """Resegmentation after out-of-order ingest: cross-batch late data
    legally produces time-OVERLAPPING segments per series (the relaxed
    semantics the reference shares, compression.rs:109-141) — correct,
    but every read of that series then decodes and merges more segments
    than it should, forever. This pass detects each series' overlaps
    with one window (running-max of end_time vs next start_time),
    passes clean series through VERBATIM, and decode+refits only the
    overlapping ones into disjoint, time-ordered segments.

    Cost: one shuffle on (field, series) for the window, plus
    decode+fit proportional to the overlapping fraction — a series
    that was always in order costs a window pass and nothing else.
    """
    from pyspark.sql import Window

    keys = ["field_column", *tag_columns]
    w = Window.partitionBy(*keys).orderBy("start_time", "end_time")
    running_end = F.max("end_time").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    overlap = F.when(
        running_end.isNotNull() & (F.col("start_time") <= running_end), 1
    ).otherwise(0)
    marked = segments.withColumn("__ov__", overlap).withColumn(
        "__dirty__", F.max("__ov__").over(Window.partitionBy(*keys))
    )
    clean = marked.where(F.col("__dirty__") == 0).drop("__ov__", "__dirty__")
    dirty = marked.where(F.col("__dirty__") == 1).drop("__ov__", "__dirty__")
    # grouped refit: a dirty series is ALWAYS refit as one unit, so the
    # 'disjoint, time-ordered' postcondition holds regardless of how
    # many segments the series has (mapInPandas Arrow batches would
    # split a >10k-segment series into independently-refit pieces)
    return clean.unionByName(refit_series_grouped(dirty, tag_columns))
