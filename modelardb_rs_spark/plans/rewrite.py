"""Rewrite catalog (see the implementing modules):

- timestamp predicate → segment-interval predicate
  (reference time_series_table.rs:269-373): ``operators.grid.prune_segments``
  rewrites a point-level time range to ``end_time >= lo AND start_time <= hi``
  on the segments scan, and the point-level predicate is re-applied after
  decode. Catalyst then pushes the interval predicate into the Parquet
  row-group/page filters.

- model-based simple aggregates
  (reference model_simple_aggregates.rs:175-334):
  ``Engine._try_aggregate_pushdown`` + ``operators.aggregates`` — an
  API-level SQL rewrite, because pure PySpark cannot register Catalyst
  physical rules; raw ``spark.sql`` over the gridded view remains always
  correct, just slower.

- partition pruning on ``field_column``: free — the segments dataset is
  written ``partitionBy("field_column")`` and Catalyst prunes directories
  on the ``field_column IN (...)`` filters the grid builder emits.
- projection pruning including generated-column sources: the grid view
  only decodes the fields a projection needs (operators/grid.py).
"""

from modelardb_rs_spark.operators.aggregates import pushdown_agg_column, segment_aggregates
from modelardb_rs_spark.operators.grid import prune_segments

__all__ = ["prune_segments", "pushdown_agg_column", "segment_aggregates"]
