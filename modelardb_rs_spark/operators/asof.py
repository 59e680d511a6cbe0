"""As-of (temporal) join — an operator Spark lacks natively.

The reference system also lacks it (SURVEY.md §2.4: not in DataFusion's
exposed SQL there), but it is the bread-and-butter temporal operator a
time-series engine should offer, so it is provided as a first-class
composition of built-in ops.

Strategy (scalable, no per-group pandas): union both sides tagged with a
side marker, then one window pass per key ordered by (time, side) takes
``last(right_value, ignorenulls=True)`` over the preceding rows — each
left row picks up the most recent right row with ``right.ts <= left.ts``.
Cost: one shuffle on the key + one sort, identical to a sort-merge join;
skewed keys are handled by AQE. An optional tolerance drops matches older
than ``tolerance_us``.

(Contrast with the common ``applyInPandas``+``pd.merge_asof`` recipe:
that materializes each key group in one Python worker — this stays
JVM-side and streams.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_value_cols: list[str],
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the most recent right row (same ``by``
    keys, ``right.on <= left.on``). ``on`` must be the same column name
    on both sides (timestamp or numeric)."""
    l = left.withColumn("__side__", F.lit(1))
    r = right.select(
        *by, on, *[F.col(c).alias(c + suffix) for c in right_value_cols]
    ).withColumn("__side__", F.lit(0))
    all_cols = set(l.columns) | set(r.columns)
    l = l.select(*[F.col(c) if c in l.columns else F.lit(None).alias(c) for c in all_cols])
    r = r.select(*[F.col(c) if c in r.columns else F.lit(None).alias(c) for c in all_cols])
    u = l.unionByName(r)

    # Right rows sort before left rows at equal timestamps so an exactly
    # concurrent right row is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
        for c in right_value_cols
    ]
    carried.append(
        F.last(F.when(F.col("__side__") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("__right_ts__")
    )
    out = u.select(
        *[c for c in left.columns], "__side__", *carried
    ).where(F.col("__side__") == 1)
    if tolerance_us is not None:
        # numeric `on` columns already hold µs — casting a long to
        # timestamp would reinterpret it as SECONDS and inflate the age
        # by 1e6, nulling out nearly every match
        if dict(left.dtypes)[on].startswith("timestamp"):
            age = F.unix_micros(F.col(on)) - F.unix_micros(F.col("__right_ts__"))
        else:
            age = F.col(on) - F.col("__right_ts__")
        keep = F.col("__right_ts__").isNotNull() & (age <= F.lit(int(tolerance_us)))
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(c + suffix)).alias(c + suffix)
                for c in right_value_cols
            ],
        )
    else:
        out = out.select(
            *[c for c in left.columns], *[F.col(c + suffix) for c in right_value_cols]
        )
    return out


def interpolation_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_value_cols: list[str],
    suffix: str = "_interp",
) -> DataFrame:
    """For every left row, LINEARLY INTERPOLATE each right value between
    the bracketing right rows (same ``by`` keys, nearest right.on at or
    before and at or after left.on) — the Timescale/InfluxDB
    ``interpolate`` analog, where ``asof_join`` is their LOCF.

    Exact-timestamp matches return the right value itself; left rows
    outside the right side's time span get NULL (strict interpolation,
    matching gapfill's "linear" contract). Right value columns are
    assumed non-null (their nulls would silently widen the bracket).

    Same scale shape as ``asof_join``: one union, one shuffle on the
    key, two window passes (preceding / following) — no per-group
    pandas, no cross join; skewed keys fall to AQE.
    """
    l = left.withColumn("__side__", F.lit(1))
    r = right.select(
        *by, on, *[F.col(c).alias(c + suffix) for c in right_value_cols]
    ).withColumn("__side__", F.lit(0))
    all_cols = set(l.columns) | set(r.columns)
    l = l.select(*[F.col(c) if c in l.columns else F.lit(None).alias(c) for c in all_cols])
    r = r.select(*[F.col(c) if c in r.columns else F.lit(None).alias(c) for c in all_cols])
    u = l.unionByName(r)

    if dict(left.dtypes)[on].startswith("timestamp"):
        t_num = F.unix_micros(F.col(on))
    else:
        t_num = F.col(on).cast("long")
    u = u.withColumn("__t__", t_num)

    # right rows sort before left at equal times: the preceding window
    # sees a concurrent right row (exact match), the following window
    # starts at the current row so it sees only later right rows
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    right_only = lambda c: F.when(F.col("__side__") == 0, c)  # noqa: E731
    prev_t = F.last(right_only(F.col("__t__")), ignorenulls=True).over(w_prev)
    next_t = F.first(right_only(F.col("__t__")), ignorenulls=True).over(w_next)
    cols = [F.col("__t__").alias("__lt__"), prev_t.alias("__pt__"), next_t.alias("__nt__")]
    for c in right_value_cols:
        cols.append(
            F.last(right_only(F.col(c + suffix)), ignorenulls=True).over(w_prev).alias(f"__pv_{c}__")
        )
        cols.append(
            F.first(right_only(F.col(c + suffix)), ignorenulls=True).over(w_next).alias(f"__nv_{c}__")
        )
    staged = u.select(*[F.col(c) for c in left.columns], "__side__", *cols).where(
        F.col("__side__") == 1
    )
    frac = (F.col("__lt__") - F.col("__pt__")) / (F.col("__nt__") - F.col("__pt__"))
    out_cols = list(left.columns)
    for c in right_value_cols:
        pv, nv = F.col(f"__pv_{c}__"), F.col(f"__nv_{c}__")
        interp = (
            F.when(F.col("__pt__") == F.col("__lt__"), pv)
            .when(F.col("__pt__").isNull() | F.col("__nt__").isNull(), F.lit(None))
            .otherwise(pv + (nv - pv) * frac)
        )
        out_cols.append(interp.alias(c + suffix))
    return staged.select(*out_cols)
