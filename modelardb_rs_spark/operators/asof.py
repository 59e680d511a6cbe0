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
