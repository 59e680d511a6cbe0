"""Per-series windowed transforms over the gridded view: finite
differences / rates (the PromQL ``rate()`` / ``delta()`` monitoring
idiom) and rolling means. All are one window partitioned by series and
ordered by time — the shuffle is keyed per series, so the work
distributes across series with no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _series_window(series_cols: list[str], ts_col: str):
    from pyspark.sql import Window

    return Window.partitionBy(*series_cols).orderBy(ts_col)


def deltas(
    points: DataFrame,
    series_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> DataFrame:
    """Per-point finite difference and per-second rate vs the previous
    point of the same series. First point of a series: NULL delta/rate.

    Output: input columns + ``delta`` (double), ``dt_s`` (double,
    seconds since previous point), ``rate`` (double, delta/dt_s; NULL
    when dt_s == 0 — duplicate timestamps carry no rate).
    """
    w = _series_window(series_cols, ts_col)
    v = F.col(value_col).cast("double")
    t_us = F.unix_micros(F.col(ts_col))
    delta = v - F.lag(v).over(w)
    dt_s = (t_us - F.lag(t_us).over(w)).cast("double") / 1e6
    rate = F.when(dt_s > 0, delta / dt_s)
    return (
        points.withColumn("delta", delta)
        .withColumn("dt_s", dt_s)
        .withColumn("rate", rate)
    )


def rolling_mean(
    points: DataFrame,
    series_cols: list[str],
    n: int,
    ts_col: str = "timestamp",
    value_col: str = "value",
    out_col: str = "rolling_mean",
) -> DataFrame:
    """Trailing mean over the last ``n`` points of each series
    (including the current one; fewer at a series head — standard
    ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW semantics)."""
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError("n must be positive")
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(-(int(n) - 1), Window.currentRow)
    )
    return points.withColumn(out_col, F.avg(F.col(value_col).cast("double")).over(w))


def cusum_changepoint(
    points: DataFrame,
    series_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
) -> DataFrame:
    """Single mean-shift changepoint per series by the CUSUM statistic
    (Page 1954 / the binary-segmentation first split): with running sum
    ``S_i`` over the series' ``n`` points in time order, the statistic
    ``D_i = |S_i - (i/n) * S_n|`` peaks at the point where the mean
    shifts; the argmax over INTERIOR points (1 <= i <= n-1) is the
    split, reported with the means of the two segments it induces. The
    "when did this sensor change regime" read; series with fewer than
    2 points have no interior split and are dropped.

    Output, one row per series: series_cols + ``n_points``,
    ``cp_<ts_col>`` (the LAST point of the left segment), ``d_stat``
    (rounded 6), ``mean_before`` / ``mean_after`` / ``shift``
    (rounded 6). Ties in D break to the earliest point.

    Scale shape: everything is windows over ONE partitioning by series
    — the running sum, the per-series totals, and the argmax rank reuse
    the same exchange (per-partition re-sorts only), so the cost is a
    single shuffle keyed by series and the work distributes across
    series. Exactly SQL-expressible, so entries can round values
    upstream and value-check the split point itself. No decode beyond
    the input frame: feed it resampled bucket means and the model-store
    pushdown keeps the input tiny.

    NULL values are dropped before the scan (they carry no mean
    information; counting them would divide the segment means by
    phantom points). The running sum uses an explicit ROWS frame so it
    advances per ROW like ``row_number`` does — the default RANGE frame
    would lump timestamp peers together and de-sync S_i from i.
    Timestamps should be unique within a series (the gridded view and
    resampled buckets guarantee this); ties make the peer order, and
    therefore the split attribution among the tied points,
    partitioner-dependent.
    """
    from pyspark.sql import Window

    w_ord = (
        Window.partitionBy(*series_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy(*series_cols).orderBy(ts_col)
    w_all = Window.partitionBy(*series_cols)
    v = F.col(value_col).cast("double")
    scanned = (
        points.where(v.isNotNull())
        .withColumn("__i__", F.row_number().over(w_rn))
        .withColumn("__s__", F.sum(v).over(w_ord))
        .withColumn("__n__", F.count("*").over(w_all))
        .withColumn("__tot__", F.sum(v).over(w_all))
    )
    interior = scanned.where(
        (F.col("__n__") >= 2) & (F.col("__i__") < F.col("__n__"))
    ).withColumn(
        "__d__",
        F.abs(
            F.col("__s__")
            - F.col("__i__").cast("double") / F.col("__n__") * F.col("__tot__")
        ),
    )
    w_rank = Window.partitionBy(*series_cols).orderBy(
        F.col("__d__").desc(), F.col(ts_col)
    )
    best = interior.withColumn("__r__", F.row_number().over(w_rank)).where(
        F.col("__r__") == 1
    )
    mean_before = F.col("__s__") / F.col("__i__")
    mean_after = (F.col("__tot__") - F.col("__s__")) / (
        F.col("__n__") - F.col("__i__")
    )
    return best.select(
        *series_cols,
        F.col("__n__").alias("n_points"),
        F.col(ts_col).alias(f"cp_{ts_col}"),
        F.round(F.col("__d__"), 6).alias("d_stat"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
        F.round(mean_after - mean_before, 6).alias("shift"),
    )
