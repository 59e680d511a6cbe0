"""Table profiling — the data-quality pass a large ingest pipeline runs
before training: per-column null counts, exact distinct cardinality, and
min/max, in ONE aggregation over the table.

Scale shape: a single groupBy-less aggregate (partial aggregation
map-side, one exchange); exact COUNT(DISTINCT) per column rewrites to
Spark's expand+two-phase aggregate, which is the right default for
profiling runs (swap in approx_count_distinct for trillion-row tables —
noted rather than defaulted because the exact form has a portable SQL
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One output row per profiled column:
    (column, dtype, n_rows, n_nulls, null_frac, n_distinct, min_str, max_str).

    min/max are cast to strings so heterogeneous column types share one
    schema; NULL for all-null columns.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"nulls_{c}"),
            F.countDistinct(col).alias(f"dist_{c}"),
            F.min(col).cast("string").alias(f"min_{c}"),
            F.max(col).cast("string").alias(f"max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n__").alias("n_rows"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.round(
                    F.when(F.col("__n__") > 0, F.col(f"nulls_{c}") / F.col("__n__"))
                    .otherwise(F.lit(0.0)),
                    6,
                ).alias("null_frac"),
                F.col(f"dist_{c}").alias("n_distinct"),
                F.col(f"min_{c}").alias("min_str"),
                F.col(f"max_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
