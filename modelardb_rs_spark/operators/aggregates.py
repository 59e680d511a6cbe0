"""Model-based (segment-pushdown) simple aggregates.

Reference semantics: the ``ModelSimpleAggregates`` physical optimizer
rule rewrites un-grouped, un-filtered COUNT/MIN/MAX/SUM/AVG over one
field column to run directly on segment metadata without reconstruction
(crates/modelardb_storage/src/optimizer/model_simple_aggregates.rs:175-618;
segment math crates/modelardb_compression/src/models/mod.rs:98-184).

Spark-first translation: the segments table stores ``value_count`` and
``seg_sum`` as plain columns (see types.segment_schema — the closed-form
per-model length/sum math runs once at compression time instead of once
per query), so every pushed-down aggregate is pure JVM-side Column
aggregation over four narrow columns:

    COUNT(f) -> SUM(value_count)        MIN(f) -> MIN(min_value)
    SUM(f)   -> SUM(seg_sum)            MAX(f) -> MAX(max_value)
    AVG(f)   -> SUM(seg_sum) / SUM(value_count)

At 100 TB this reads only the stats columns of the segment Parquet files
(column pruning) — no binary payloads, no decode, no Python. GROUP BY
tag columns IS supported here (a strict superset of the reference rule,
which bails on any GROUP BY): tags are segment-row columns, so grouped
aggregates are equally exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMPLE_AGGS = ("count", "min", "max", "sum", "avg")


def pushdown_agg_column(func: str, field_index: int | None = None) -> Column:
    """The segment-level Column expression for one simple aggregate.

    ``field_index`` restricts to one field_column partition when the
    segments DataFrame holds several fields (conditional aggregation).
    """
    func = func.lower()
    if func not in SIMPLE_AGGS:
        raise ValueError(f"not a pushdown-able aggregate: {func}")
    cond = (F.col("field_column") == F.lit(field_index)) if field_index is not None else F.lit(True)

    def only(c: Column) -> Column:
        return F.when(cond, c)

    if func == "count":
        return F.coalesce(F.sum(only(F.col("value_count"))), F.lit(0)).cast("long")
    if func == "min":
        return F.min(only(F.col("min_value")))
    if func == "max":
        return F.max(only(F.col("max_value")))
    if func == "sum":
        # Spark SUM(float) accumulates in double; seg_sum is the f64 sum of
        # reconstructed values, so the result matches gridded SUM(value)
        # modulo f64 addition order.
        return F.sum(only(F.col("seg_sum")))
    # avg
    return (F.sum(only(F.col("seg_sum"))) / F.sum(only(F.col("value_count")))).cast("double")


def segment_aggregates(
    segments: DataFrame,
    aggs: list[tuple[str, int | None, str]],
    group_by_tags: list[str] | None = None,
) -> DataFrame:
    """Run simple aggregates directly on a segments DataFrame.

    ``aggs``: list of (func, field_index|None, output_alias).
    """
    # Restrict the scan to the referenced field partitions up front so
    # Delta/Parquet partition pruning applies (the per-agg CASE WHEN alone
    # would force a full scan of every field_column directory).
    indexes = {idx for _, idx, _ in aggs if idx is not None}
    if indexes:
        segments = segments.where(F.col("field_column").isin(sorted(indexes)))
    cols = [pushdown_agg_column(func, idx).alias(alias) for func, idx, alias in aggs]
    if group_by_tags:
        return segments.groupBy(*group_by_tags).agg(*cols)
    return segments.agg(*cols)


def time_range_aggregates(
    segments: DataFrame,
    tag_columns: list[str],
    aggs: list[tuple[str, int | None, str]],
    start_us: int,
    end_us: int,
    group_by_tags: list[str] | None = None,
) -> DataFrame:
    """Simple aggregates under a time-range predicate, answered mostly
    from segment statistics: segments fully inside [start, end]
    contribute their stats columns directly; only segments *straddling* a
    boundary are decoded and filtered point-wise. The reference's rule
    bails on any predicate (model_simple_aggregates.rs fires only with no
    pushed filters) — this is a strict superset, and the dominant-cost
    shape at scale: a month-long query over a year of data decodes only
    the two boundary segments per series.

    Exactness: stats describe the reconstructed values (types.py), so
    interior-stats + decoded-boundary equals the fully-gridded aggregate.
    """
    from modelardb_rs_spark.operators.grid import grid_univariate

    pruned = segments.where(
        (F.col("end_time") >= F.lit(int(start_us))) & (F.col("start_time") <= F.lit(int(end_us)))
    )
    # Restrict both passes to the referenced field partitions up front
    # (partition pruning on field_column).
    indexes = {idx for _, idx, _ in aggs}
    if None not in indexes:
        pruned = pruned.where(F.col("field_column").isin(sorted(indexes)))
    inside = pruned.where(
        (F.col("start_time") >= F.lit(int(start_us))) & (F.col("end_time") <= F.lit(int(end_us)))
    )
    boundary = pruned.where(
        (F.col("start_time") < F.lit(int(start_us))) | (F.col("end_time") > F.lit(int(end_us)))
    )

    group = list(group_by_tags or [])

    # ONE stats projection + ONE boundary decode feed a single final
    # aggregation: every requested aggregate becomes a pair of partial
    # columns (null where the row's field doesn't match), so a 5-aggregate
    # query still scans the stats columns once and decodes each boundary
    # segment once — instead of one job per aggregate.
    def match(idx: int | None, field_col: Column) -> Column:
        return F.lit(True) if idx is None else field_col == F.lit(idx)

    stat_cols, point_cols, final_cols = [], [], []
    for func, idx, alias in aggs:
        seg_m = match(idx, F.col("field_column"))
        pt_m = match(idx, F.col("__field__").cast("int"))
        if func == "count":
            stat_cols.append(F.when(seg_m, F.col("value_count").cast("long")).alias(f"c_{alias}"))
            point_cols.append(F.when(pt_m, F.lit(1).cast("long")).alias(f"c_{alias}"))
            final_cols.append(F.coalesce(F.sum(f"c_{alias}"), F.lit(0)).cast("long").alias(alias))
        elif func == "sum":
            stat_cols.append(F.when(seg_m, F.col("seg_sum")).alias(f"s_{alias}"))
            point_cols.append(F.when(pt_m, F.col("value").cast("double")).alias(f"s_{alias}"))
            final_cols.append(F.sum(f"s_{alias}").alias(alias))
        elif func == "min":
            stat_cols.append(F.when(seg_m, F.col("min_value")).alias(f"m_{alias}"))
            point_cols.append(F.when(pt_m, F.col("value")).alias(f"m_{alias}"))
            final_cols.append(F.min(f"m_{alias}").alias(alias))
        elif func == "max":
            stat_cols.append(F.when(seg_m, F.col("max_value")).alias(f"x_{alias}"))
            point_cols.append(F.when(pt_m, F.col("value")).alias(f"x_{alias}"))
            final_cols.append(F.max(f"x_{alias}").alias(alias))
        elif func == "avg":
            stat_cols.append(F.when(seg_m, F.col("seg_sum")).alias(f"as_{alias}"))
            stat_cols.append(F.when(seg_m, F.col("value_count").cast("long")).alias(f"ac_{alias}"))
            point_cols.append(F.when(pt_m, F.col("value").cast("double")).alias(f"as_{alias}"))
            point_cols.append(F.when(pt_m, F.lit(1).cast("long")).alias(f"ac_{alias}"))
            final_cols.append(
                (F.sum(f"as_{alias}") / F.sum(f"ac_{alias}")).cast("double").alias(alias)
            )
        else:
            raise ValueError(f"not a pushdown-able aggregate: {func}")

    stats_part = inside.select(*group, *stat_cols)
    points = grid_univariate(
        boundary.withColumn("__field__", F.col("field_column").cast("string")),
        tag_columns + ["__field__"],
        start_us,
        end_us,
    )
    points_part = points.select(*group, *point_cols)
    u = stats_part.unionByName(points_part)
    return u.groupBy(*group).agg(*final_cols) if group else u.agg(*final_cols)
