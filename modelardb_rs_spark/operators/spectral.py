"""Spectral analysis as Column algebra: periodicity strength per series.

A single DFT bin needs no FFT: power at frequency f over points
(t, v) is |Σ v·e^{-2πift}|² = (Σ v·cos 2πft)² + (Σ v·sin 2πft)² — two
plain aggregations of JVM-evaluated trig expressions. That makes "how
strongly daily is this sensor" a pushdown-friendly, SQL-oracle-able
read instead of a Python FFT job: candidate frequencies are exploded
(a handful of rows per point), one groupBy(series, freq) accumulates
the cos/sin sums map-side, and the dominant frequency is a row_number
pick. O(points × candidate frequencies), no Python, no FFT library.

Values are centered per series (subtract the mean) so the DC component
does not swamp every bin, and power is normalized by n so series of
different lengths compare.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spectral_power(
    bucketed: DataFrame,
    series_cols: list[str],
    period_us_list: list[int],
    bucket_col: str = "bucket",
    value_col: str = "v",
) -> DataFrame:
    """Normalized spectral power of each series at each candidate
    period: (series, period_us, n, power) where power =
    ((Σ v̄·cos ωt)² + (Σ v̄·sin ωt)²) / n², v̄ mean-centered.
    Input: per-series bucket means (resample output)."""
    dt = dict(bucketed.dtypes)[bucket_col]
    t_us = (
        F.unix_micros(F.col(bucket_col))
        if dt.startswith("timestamp")
        else F.col(bucket_col).cast("long")
    )
    series = F.concat_ws(" ", *[F.col(c) for c in series_cols])
    base = bucketed.select(
        series.alias("series"),
        t_us.alias("__t__"),
        F.col(value_col).cast("double").alias("__v__"),
    ).where(F.col("__v__").isNotNull())
    mu = Window.partitionBy("series")
    centered = base.withColumn("__vc__", F.col("__v__") - F.avg("__v__").over(mu))
    freqs = F.explode(
        F.array(*[F.lit(int(p)) for p in period_us_list])
    ).alias("period_us")
    ex = centered.select("series", "__t__", "__vc__", freqs)
    omega_t = 2.0 * math.pi * (F.col("__t__") % F.col("period_us")) / F.col("period_us")
    return (
        ex.groupBy("series", "period_us")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("__vc__") * F.cos(omega_t)).alias("__c__"),
            F.sum(F.col("__vc__") * F.sin(omega_t)).alias("__s__"),
        )
        .select(
            "series",
            "period_us",
            "n",
            ((F.col("__c__") ** 2 + F.col("__s__") ** 2) / (F.col("n") ** 2)).alias("power"),
        )
    )


def dominant_period(
    bucketed: DataFrame,
    series_cols: list[str],
    period_us_list: list[int],
    bucket_col: str = "bucket",
    value_col: str = "v",
) -> DataFrame:
    """Each series' strongest candidate period:
    (series, period_us, n, power), ties broken by the shorter period."""
    p = spectral_power(bucketed, series_cols, period_us_list, bucket_col, value_col)
    w = Window.partitionBy("series").orderBy(F.col("power").desc(), F.col("period_us"))
    return (
        p.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )
