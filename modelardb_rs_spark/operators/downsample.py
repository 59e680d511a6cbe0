"""M4 visualization downsampling (Jugel et al., VLDB 2014 — public
method): per (series, time bucket), keep the first, last, minimum, and
maximum points. M4 is the error-free downsampling for line-chart
rendering at a given pixel width: ≤ 4 points per bucket reproduce the
exact pixel-column envelope of the full series.

Spark-first: one groupBy (series, bucket) computing four struct
extremums (struct ordering makes ties deterministic: earliest timestamp
for value ties, the point's value rides along for timestamp extremes) —
a single shuffle keyed by (series, bucket), then a distinct over the
emitted points. Output size is bounded by 4 × buckets × series
regardless of input points; that bound is the reason to push THIS to the
data instead of shipping raw points to a dashboard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram(
    points: DataFrame,
    series_cols: list[str],
    lo: float,
    hi: float,
    nbins: int,
    value_col: str = "value",
) -> DataFrame:
    """Fixed-bin value histogram per series — the distribution summary a
    monitoring dashboard draws next to the line chart. Bin i covers
    [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/nbins; values below lo
    clamp to bin 0, values at or above hi clamp to bin nbins−1 (so the
    histogram always accounts for every point). One groupBy
    (series, bin) — a single shuffle, output ≤ nbins·series rows.

    Output: (*series_cols, bin int, bin_lo double, n long).
    """
    if nbins <= 0 or not hi > lo:
        raise ValueError("need nbins > 0 and hi > lo")
    w = (float(hi) - float(lo)) / int(nbins)
    raw = F.floor((F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(w))
    bin_i = F.least(F.greatest(raw, F.lit(0)), F.lit(int(nbins) - 1)).cast("int")
    return (
        points.select(*series_cols, bin_i.alias("bin"))
        .groupBy(*series_cols, "bin")
        .agg(F.count("*").alias("n"))
        .withColumn("bin_lo", F.lit(float(lo)) + F.col("bin") * F.lit(w))
        .select(*series_cols, "bin", "bin_lo", "n")
    )


def m4_downsample(
    points: DataFrame,
    series_cols: list[str],
    bucket_us: int,
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> DataFrame:
    """``points``: (ts_col TimestampType or µs long, value_col, *series).
    Output: (*series, bucket TimestampType, timestamp, value) — the
    distinct M4 points, one row each.
    """
    B = int(bucket_us)
    if B <= 0:
        raise ValueError("bucket_us must be positive")
    dt = dict(points.dtypes)[ts_col]
    t_us = F.col(ts_col) if dt == "bigint" else F.unix_micros(F.col(ts_col))
    pts = points.select(
        *series_cols,
        t_us.alias("__t__"),
        F.col(value_col).alias("__v__"),
    ).withColumn("__b__", F.expr(f"__t__ - pmod(__t__, {B})"))
    tv = F.struct(F.col("__t__").alias("t"), F.col("__v__").alias("v"))
    vt = F.struct(F.col("__v__").alias("v"), F.col("__t__").alias("t"))
    agg = pts.groupBy(*series_cols, "__b__").agg(
        F.min(tv).alias("first"),
        F.max(tv).alias("last"),
        F.min(vt).alias("vmin"),
        F.max(vt).alias("vmax"),
    )
    four = agg.select(
        *series_cols,
        F.timestamp_micros(F.col("__b__")).alias("bucket"),
        F.explode(
            F.array(
                F.struct(F.col("first.t").alias("t"), F.col("first.v").alias("v")),
                F.struct(F.col("last.t").alias("t"), F.col("last.v").alias("v")),
                F.struct(F.col("vmin.t").alias("t"), F.col("vmin.v").alias("v")),
                F.struct(F.col("vmax.t").alias("t"), F.col("vmax.v").alias("v")),
            )
        ).alias("p"),
    )
    return four.select(
        *series_cols,
        "bucket",
        F.timestamp_micros(F.col("p.t")).alias(ts_col),
        F.col("p.v").alias(value_col),
    ).distinct()
