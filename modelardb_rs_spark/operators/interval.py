"""Interval (time-range) overlap join — bucketized, duplicate-free.

Spark has no native range join: ``l.start < r.end AND r.start < l.end``
plans as a broadcast-nested-loop (or cartesian) join, which is O(|L|·|R|)
and the canonical 100 TB trap. The scale shape is the classic bucketized
interval join (the same idea behind Databricks' range-join hints and
GenomicsDB/Hail interval joins):

1. explode each interval into the fixed-width time buckets it covers,
2. equi-join on the bucket (shuffle/broadcast on a KEY, so Catalyst
   plans a hash join — work proportional to co-bucketed pairs, not
   |L|·|R|),
3. re-check the exact overlap predicate,
4. attribute each qualifying pair to ONE bucket — the bucket containing
   ``greatest(l.start, r.start)`` — so overlapping pairs that share
   several buckets emit exactly once WITHOUT a distinct/dedup shuffle.

``bucket_width`` trades explode factor against join selectivity: wider
buckets emit fewer rows per interval but more candidate pairs per
bucket. Pick it near the typical interval length; long-tailed intervals
cost their true length / width in duplicated rows (documented, linear,
and skew-safe — a hot bucket splits across AQE sub-partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    bucket_width_us: int,
    left_start: str = "start_us",
    left_end: str = "end_us",
    right_start: str = "start_us",
    right_end: str = "end_us",
    extra_on: list[str] | None = None,
) -> DataFrame:
    """All (left row, right row) pairs whose half-open µs intervals
    [start, end) overlap, optionally also matching ``extra_on`` equality
    keys (which join into the bucket key, sharpening the hash join).
    Column name collisions are resolved by prefixing right columns with
    ``r_``. Emits each qualifying pair exactly once."""
    if bucket_width_us <= 0:
        raise ValueError(f"bucket_width_us must be positive, got {bucket_width_us}")
    W = int(bucket_width_us)
    on = list(extra_on or [])

    def explode_buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        first = (F.col(s) / W).cast("long")
        # half-open: an interval ending exactly on a bucket edge does
        # not cover that bucket
        last = ((F.col(e) - 1) / W).cast("long")
        return df.where(F.col(e) > F.col(s)).withColumn(
            "__bucket__", F.explode(F.sequence(first, last))
        )

    lb = explode_buckets(left, left_start, left_end)
    rb = explode_buckets(right, right_start, right_end)
    renames = {
        c: f"r_{c}" for c in right.columns if c in left.columns
    }
    for old, new in renames.items():
        rb = rb.withColumnRenamed(old, new)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)
    join_keys = ["__bucket__"] + [
        k for k in on
    ]  # extra keys must exist unrenamed on both sides
    for k in on:
        if k in renames:
            rb = rb.withColumnRenamed(renames[k], k)
    pairs = lb.join(rb, join_keys)
    overlap = (F.col(left_start) < F.col(r_end)) & (F.col(r_start) < F.col(left_end))
    # exactly-once attribution: only the bucket holding the overlap's
    # left edge emits the pair
    anchor = (F.greatest(F.col(left_start), F.col(r_start)) / W).cast("long")
    return pairs.where(overlap & (F.col("__bucket__") == anchor)).drop("__bucket__")
