"""Gap-filling over regular time buckets (the TimescaleDB
``time_bucket_gapfill`` / InfluxDB ``fill()`` shape — surface the
reference does not offer; pure post-processing over the resample
operator's bucketed output).

Spark-first: the per-series bucket spine is ``explode(sequence(min_bucket,
max_bucket, interval))`` off a per-series min/max aggregate; missing
buckets appear via a left join; fills are window functions partitioned by
series. Every shuffle is keyed by series — no global hot key, and the
output size equals the spine, which is the user-requested resolution.

Fill methods:
  - ``locf``   last observation carried forward (leading gaps stay NULL)
  - ``linear`` linear interpolation between the nearest observed buckets
               (leading/trailing gaps stay NULL — strict interpolation)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_at(
    segments: DataFrame,
    tag_columns: list[str],
    t_us: int,
    method: str = "linear",
    may_have_slow: bool = True,
    fast_fraction: float | None = None,
) -> DataFrame:
    """Point-in-time lookup: the (interpolated) value of every series at
    one timestamp, decoding only O(series) candidate segments.

    Candidate set per series (exact even under overlapping duplicate
    writes): segments covering t, plus the max-end segment strictly
    before t, plus the min-start segment strictly after t — the nearest
    observed point on each side provably lives in one of these. ``locf``
    returns the nearest point at-or-before t; ``linear`` interpolates
    between the two neighbors (NULL outside the observed span).

    Output: (*tags, field_column int, timestamp µs == t, value double).
    """
    from pyspark.sql import Window

    from modelardb_rs_spark.operators.grid import grid_univariate

    if method not in ("locf", "linear"):
        raise ValueError(f"unknown value_at method: {method}")
    t = int(t_us)
    keys = tag_columns + ["field_column"]
    w = Window.partitionBy(*keys)
    cov = segments.where(
        (F.col("start_time") <= F.lit(t)) & (F.col("end_time") >= F.lit(t))
    )
    bef = (
        segments.where(F.col("end_time") < F.lit(t))
        .withColumn("__m__", F.max("end_time").over(w))
        .where(F.col("end_time") == F.col("__m__"))
        .drop("__m__")
    )
    aft = (
        segments.where(F.col("start_time") > F.lit(t))
        .withColumn("__m__", F.min("start_time").over(w))
        .where(F.col("start_time") == F.col("__m__"))
        .drop("__m__")
    )
    cand = cov.unionByName(bef).unionByName(aft)
    pts = grid_univariate(
        cand.withColumn("field_column", F.col("field_column").cast("string")),
        keys,
        may_have_slow=may_have_slow,
        fast_fraction=fast_fraction,
    )
    ts, v = F.col("timestamp"), F.col("value")
    prev_s = F.max(F.when(ts <= F.lit(t), F.struct(ts.alias("t"), v.alias("v"))))
    next_s = F.min(F.when(ts >= F.lit(t), F.struct(ts.alias("t"), v.alias("v"))))
    agg = pts.groupBy(
        *tag_columns, F.col("field_column").cast("int").alias("field_column")
    ).agg(prev_s.alias("__p__"), next_s.alias("__n__"))
    pt, pv = F.col("__p__.t"), F.col("__p__.v").cast("double")
    nt, nv = F.col("__n__.t"), F.col("__n__.v").cast("double")
    if method == "locf":
        filled = pv
    else:
        filled = (
            F.when(pt == F.lit(t), pv)
            .when(
                F.col("__p__").isNotNull() & F.col("__n__").isNotNull(),
                pv + (nv - pv) * (F.lit(t) - pt).cast("double") / (nt - pt).cast("double"),
            )
            .otherwise(F.lit(None).cast("double"))
        )
    return agg.select(
        *tag_columns,
        "field_column",
        F.lit(t).alias("timestamp"),
        filled.alias("value"),
    )


def gapfill(
    buckets: DataFrame,
    series_cols: list[str],
    bucket_us: int,
    value_col: str = "value",
    bucket_col: str = "bucket",
    method: str = "linear",
) -> DataFrame:
    """Fill missing (series, bucket) rows in a regular bucketed frame.

    ``buckets``: one row per observed (series, bucket); ``bucket_col``
    must be TimestampType bucket starts aligned to ``bucket_us``.
    Output: (*series_cols, bucket, <value_col> filled, was_gap).

    Shape: the gap slots come from a per-series ``lead`` window — each
    observed bucket explodes into itself plus the empty slots up to
    (exclusive) the next observed bucket — NOT from a separate
    min/max-spine aggregate left-joined back. The spine-join form
    executed the ENTIRE upstream (for the engine path: segment scan +
    model decode + resample aggregation) twice, once per join side,
    because the two sides' pruned column sets defeat Spark's exchange
    reuse (guide §2.4); the lead window keys by the same series columns
    as the fill windows below, so the upstream runs once and all three
    windows share one exchange. Under the aligned-buckets contract the
    emitted slot set is identical: consecutive observed buckets sit on
    the same B-grid, so sequence(b_i, b_{i+1} - B, B) tiles exactly the
    closed spine sequence(min, max, B).
    """
    from pyspark.sql import Window

    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gapfill method: {method}")
    B = int(bucket_us)
    w_lead = Window.partitionBy(*series_cols).orderBy("__obs__")
    stepped = buckets.select(
        *series_cols, F.col(bucket_col).alias("__obs__"), F.col(value_col)
    ).withColumn("__nxt__", F.lead("__obs__").over(w_lead))
    j = stepped.select(
        *series_cols,
        "__obs__",
        value_col,
        # greatest(): a duplicate (series, bucket) input row (out of
        # contract) has __nxt__ == __obs__; clamping the stop to __obs__
        # emits the slot once per duplicate instead of raising on a
        # negative sequence range
        F.explode(
            F.expr(
                f"sequence(__obs__, coalesce(greatest(__nxt__ - interval {B}"
                f" microsecond, __obs__), __obs__), interval {B} microsecond)"
            )
        ).alias(bucket_col),
    )
    # NULL on every generated gap slot (and on an observed-but-NULL row,
    # matching the spine-join form's left-join semantics)
    v = F.when(F.col(bucket_col) == F.col("__obs__"), F.col(value_col))
    b_us = F.unix_micros(F.col(bucket_col))
    w_p = (
        Window.partitionBy(*series_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_n = (
        Window.partitionBy(*series_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(w_p)
    pb = F.last(F.when(v.isNotNull(), b_us), ignorenulls=True).over(w_p)
    nv = F.first(v, ignorenulls=True).over(w_n)
    nb = F.first(F.when(v.isNotNull(), b_us), ignorenulls=True).over(w_n)
    if method == "locf":
        filled = F.coalesce(v, pv)
    else:
        filled = (
            F.when(v.isNotNull(), v.cast("double"))
            .when(
                pv.isNotNull() & nv.isNotNull(),
                pv.cast("double")
                + (nv.cast("double") - pv.cast("double"))
                * (b_us - pb).cast("double")
                / (nb - pb).cast("double"),
            )
            .otherwise(F.lit(None).cast("double"))
        )
    return j.select(
        *series_cols,
        bucket_col,
        filled.alias(value_col),
        v.isNull().alias("was_gap"),
    )
