"""DataFrame → segments compression operator.

Spark-first reimplementation of the reference ingest path
(crates/modelardb_server/src/storage/uncompressed_data_manager.rs:130-600:
per-series buffering + greedy compression): the multivariate input is
shuffled so each univariate series (one tag combination) lands in one
group, sorted by time, and fitted with the vectorized greedy fitter.

Two physical strategies, chosen by table shape:

- **tagged tables**: ``repartition(tags)`` + ``sortWithinPartitions
  (tags, ts)`` + ``mapInPandas`` with a pandas groupby inside each Arrow
  batch. Every series lands wholly in one partition (hash partitioning),
  so batches arrive series-contiguous and time-sorted; a series split
  across Arrow-batch boundaries just yields boundary-split segments,
  which the data model explicitly allows (mirrors buffer-capacity
  splits, reference storage/mod.rs:53-58). Compared to
  ``groupBy().applyInPandas`` this amortizes the per-group Python/Arrow
  round trip (one UDF call per ~batch instead of per series) and keeps
  task parallelism at the partition count even when there are millions
  of tiny series — or only a handful of huge ones.
- **untagged tables** (a single global series): ``repartitionByRange``
  on the timestamp + the same ``mapInPandas`` — the single series is
  spread over time ranges instead of serializing through one task.

Out-of-order data: each batch is sorted before compression; cross-batch
overlap is permitted and resolved at read time by decoding all segments
(reference compression.rs:109-141 has the same relaxed semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_rs_spark.compression.fitter import fit_series
from modelardb_rs_spark.types import ErrorBound, TimeSeriesTableMetadata, segment_schema


def _fit_group(
    pdf: pd.DataFrame,
    ts_col: str,
    field_names: list[str],
    bounds: list[ErrorBound],
    tag_columns: list[str],
) -> pd.DataFrame:
    """Compress one pandas chunk holding one (or part of one) series."""
    pdf = pdf.sort_values(ts_col, kind="stable")
    ts_us = pdf[ts_col].to_numpy()
    if np.issubdtype(ts_us.dtype, np.datetime64):
        ts_us = ts_us.astype("datetime64[us]").astype(np.int64)
    else:
        ts_us = ts_us.astype(np.int64)
    tag_values = {}
    for t in tag_columns:
        v = pdf[t].iloc[0] if len(pdf) else None
        tag_values[t] = None if v is None or (isinstance(v, float) and np.isnan(v)) else v
    frames = []
    for idx, (fname, bound) in enumerate(zip(field_names, bounds)):
        values = pdf[fname].to_numpy(dtype=np.float32)
        cols = fit_series(ts_us, values, bound)
        seg = pd.DataFrame(cols)
        seg["model_type_id"] = seg["model_type_id"].astype(np.int8)
        seg["min_value"] = seg["min_value"].astype(np.float32)
        seg["max_value"] = seg["max_value"].astype(np.float32)
        seg["error"] = seg["error"].astype(np.float32)
        seg["value_count"] = seg["value_count"].astype(np.int32)
        seg["field_column"] = np.int16(idx)
        for t in tag_columns:
            seg[t] = tag_values[t]
        frames.append(seg)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def _fit_batch(
    pdf: pd.DataFrame,
    ts_col: str,
    field_names: list[str],
    bounds: list[ErrorBound],
    tag_columns: list[str],
) -> pd.DataFrame:
    """Compress one Arrow batch holding many (chunks of) series: group by
    tags in pandas and fit each series chunk."""
    if not tag_columns:
        return _fit_group(pdf, ts_col, field_names, bounds, tag_columns)
    frames = [
        _fit_group(g, ts_col, field_names, bounds, tag_columns)
        # dropna=False: a null tag is still a series key — silently
        # dropping those rows (pandas' default) would lose data
        for _, g in pdf.groupby(tag_columns, sort=False, dropna=False)
    ]
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def compress(
    df: DataFrame,
    meta: TimeSeriesTableMetadata,
    range_partitions: int | None = None,
) -> DataFrame:
    """Compress a multivariate DataFrame (insert schema) into segments.

    Returns a DataFrame with ``types.segment_schema(meta.tag_columns)``.
    """
    ts_col = meta.timestamp_column
    field_names = meta.field_names
    bounds = [meta.field_columns[f] for f in field_names]
    tags = list(meta.tag_columns)
    out_schema = segment_schema(tags)

    # Normalize the timestamp to µs epoch longs before it crosses to pandas.
    df = df.withColumn(
        ts_col,
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        if dict(df.dtypes)[ts_col] != "bigint"
        else F.col(ts_col),
    )

    # Enforce the non-nullable insert schema in the data path (the cast
    # alone would smuggle NULLs across to pandas as NaN, silently turning
    # declared-non-null points into values SQL treats as present).
    def _non_null(name: str):
        return F.when(F.col(name).isNotNull(), F.col(name)).otherwise(
            F.raise_error(F.lit(f"NULL {name!r} in INSERT into non-nullable column"))
        )

    df = df.withColumn(ts_col, _non_null(ts_col))
    for fname in field_names:
        df = df.withColumn(fname, _non_null(fname))

    def fit_iter(batches):
        for pdf in batches:
            if len(pdf):
                out = _fit_batch(pdf, ts_col, field_names, bounds, tags)
                if len(out):
                    yield out

    parallelism = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    if tags:
        # Range-partition on (series key, time): partition count tracks
        # data VOLUME, not tag cardinality — hash-on-tags would cap the
        # active tasks at the number of distinct series (a 5-value tag
        # serializes a cluster). A series crossing a range boundary just
        # yields boundary-split segments, which the data model allows
        # (mirrors buffer-capacity splits, reference storage/mod.rs:53-58),
        # while sparse series stay contiguous — no per-bucket segment
        # fragmentation like fixed time-bucket hashing would cause.
        shaped = df.repartitionByRange(
            range_partitions or parallelism, *tags, F.col(ts_col)
        ).sortWithinPartitions(*tags, ts_col)
    else:
        # Untagged: range-partition the single series by time so
        # compression parallelizes; segments split at partition
        # boundaries (allowed).
        shaped = df.repartitionByRange(
            range_partitions or parallelism, ts_col
        ).sortWithinPartitions(ts_col)
    return shaped.mapInPandas(fit_iter, schema=out_schema)
