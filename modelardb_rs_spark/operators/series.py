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
