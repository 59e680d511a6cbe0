"""Cross-series correlation over aligned time buckets.

Answers "which sensors move together": align every series onto a common
time-bucket grid (per-bucket mean), then compute the Pearson
correlation of every series pair over the buckets both have.

Scale shape: one shuffle to build (series, bucket, mean) — for engine
tables that input comes from ``Engine.resample``, so model-typed
segments contribute their bucket means in closed form without decoding
— then a self-equi-join keyed on the bucket. Per bucket the join
produces one row per co-observed series pair, and ``F.corr`` partials
combine map-side, so the reduce side holds one state per PAIR, not per
point. With s series that is O(s²) pair states — fine for the
hundreds-of-series dashboards this read serves; for s in the millions,
pre-filter the series set (tags) or sample buckets first, exactly like
every published correlation-matrix engine does. No driver-side loops,
no Python stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_correlation(
    bucketed: DataFrame,
    series_cols: list[str],
    bucket_col: str = "bucket",
    value_col: str = "v",
    min_buckets: int = 2,
) -> DataFrame:
    """Pairwise Pearson correlation from pre-bucketed per-series means:
    input rows (series_cols..., bucket_col, value_col), one row per
    (series, bucket). Returns (series_a, series_b, n_buckets, corr) for
    unordered pairs (series_a < series_b) with at least ``min_buckets``
    buckets observed by both."""
    series = F.concat_ws(" ", *[F.col(c) for c in series_cols])
    base = bucketed.select(
        series.alias("series"),
        F.col(bucket_col).alias("bucket"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    a = base.select(F.col("series").alias("series_a"), "bucket", F.col("v").alias("va"))
    b = base.select(F.col("series").alias("series_b"), "bucket", F.col("v").alias("vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("series_a") < F.col("series_b"))
        .groupBy("series_a", "series_b")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.corr("va", "vb").alias("corr"),
        )
        .where(F.col("n_buckets") >= min_buckets)
    )


def series_correlation(
    points: DataFrame,
    series_cols: list[str],
    bucket_us: int,
    ts_col: str = "timestamp",
    value_col: str = "value",
    min_buckets: int = 2,
) -> DataFrame:
    """``bucketed_correlation`` over a raw long/gridded points frame:
    buckets are ``floor(ts / bucket_us)`` and the per-bucket value is
    the MEAN, which is what makes series with different sampling rates
    comparable."""
    dt = dict(points.dtypes)[ts_col]
    ts_us = F.unix_micros(F.col(ts_col)) if dt.startswith("timestamp") else F.col(ts_col).cast("long")
    bucketed = (
        points.select(
            *series_cols,
            F.floor(ts_us / F.lit(int(bucket_us))).alias("bucket"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy(*series_cols, "bucket")
        .agg(F.avg("v").alias("v"))
    )
    return bucketed_correlation(bucketed, series_cols, "bucket", "v", min_buckets)


def autocorrelation(
    bucketed: DataFrame,
    series_cols: list[str],
    lag_us: int,
    bucket_col: str = "bucket",
    value_col: str = "v",
    min_pairs: int = 2,
) -> DataFrame:
    """Per-series lag autocorrelation from pre-bucketed means: Pearson
    correlation of each series with itself shifted by exactly ``lag_us``
    (missing buckets simply contribute no pair — the join is on the
    exact lag distance, not "previous existing bucket"). One self-join
    keyed on (series, bucket); corr partials combine map-side, one
    state per series. Output: (series, n_pairs, autocorr)."""
    dt = dict(bucketed.dtypes)[bucket_col]
    b_us = (
        F.unix_micros(F.col(bucket_col))
        if dt.startswith("timestamp")
        else F.col(bucket_col).cast("long")
    )
    series = F.concat_ws(" ", *[F.col(c) for c in series_cols])
    base = bucketed.select(
        series.alias("series"),
        b_us.alias("__b__"),
        F.col(value_col).cast("double").alias("v"),
    ).where(F.col("v").isNotNull())
    lead = base.select(
        "series",
        (F.col("__b__") - F.lit(int(lag_us))).alias("__b__"),
        F.col("v").alias("v_lead"),
    )
    return (
        base.join(lead, ["series", "__b__"])
        .groupBy("series")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.corr("v", "v_lead").alias("autocorr"),
        )
        .where(F.col("n_pairs") >= min_pairs)
    )
