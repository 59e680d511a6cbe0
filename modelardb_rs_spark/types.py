"""Shared types: error bounds, table metadata, physical segment schema.

Reference parity:
- ErrorBound::{Absolute(f32>0), Relative(0<pct<=100), Lossless}
  (reference crates/modelardb_types/src/types.rs:300-335).
- Column roles TIMESTAMP / FIELD / TAG with one timestamp, >=1 stored
  field, 0..n tags (types.rs:187-214).
- Physical segment schema (crates/modelardb_types/src/schemas.rs:40-52)
  plus two Spark-first divergences documented below.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class TableKind(str, Enum):
    NORMAL = "normal"
    TIME_SERIES = "time_series"


class ErrorBoundKind(str, Enum):
    LOSSLESS = "lossless"
    ABSOLUTE = "absolute"
    RELATIVE = "relative"


@dataclass(frozen=True)
class ErrorBound:
    """Per-field error bound (reference types.rs:300-335).

    - lossless: reconstructed value must equal the stored value exactly.
    - absolute(v): |reconstructed - real| <= v, v > 0.
    - relative(pct): |reconstructed - real| <= |real| * pct/100, 0 < pct <= 100.
    """

    kind: ErrorBoundKind = ErrorBoundKind.LOSSLESS
    value: float = 0.0

    @staticmethod
    def lossless() -> "ErrorBound":
        return ErrorBound(ErrorBoundKind.LOSSLESS, 0.0)

    @staticmethod
    def absolute(value: float) -> "ErrorBound":
        if not (value > 0.0) or math.isinf(value) or math.isnan(value):
            raise ValueError(f"absolute error bound must be a positive finite float, got {value}")
        return ErrorBound(ErrorBoundKind.ABSOLUTE, float(value))

    @staticmethod
    def relative(pct: float) -> "ErrorBound":
        if not (0.0 < pct <= 100.0):
            raise ValueError(f"relative error bound must be in (0, 100], got {pct}")
        return ErrorBound(ErrorBoundKind.RELATIVE, float(pct))

    @property
    def is_lossless(self) -> bool:
        return self.kind == ErrorBoundKind.LOSSLESS

    def describe(self) -> str:
        """Human-readable form for DESCRIBE output: 'lossless', '0.5',
        or '5.0%' — mirroring the DDL syntax."""
        if self.kind == ErrorBoundKind.LOSSLESS:
            return "lossless"
        if self.kind == ErrorBoundKind.ABSOLUTE:
            return f"{self.value:g}"
        return f"{self.value:g}%"

    def to_json(self) -> dict:
        return {"kind": self.kind.value, "value": self.value}

    @staticmethod
    def from_json(d: dict) -> "ErrorBound":
        return ErrorBound(ErrorBoundKind(d["kind"]), float(d["value"]))


@dataclass(frozen=True)
class GeneratedColumn:
    """A FIELD AS (expr) column: computed at query time from stored columns,
    never stored, no error bound (reference types.rs:87-89,339-360).
    The expression is kept as a Spark SQL string and applied with F.expr().
    """

    name: str
    expr_sql: str

    def to_json(self) -> dict:
        return {"name": self.name, "expr_sql": self.expr_sql}

    @staticmethod
    def from_json(d: dict) -> "GeneratedColumn":
        return GeneratedColumn(d["name"], d["expr_sql"])


# Model type ids (reference crates/modelardb_compression/src/models/mod.rs:36-38).
PMC_MEAN_ID = 0
SWING_ID = 1
GORILLA_ID = 2  # "MacaqueV" in the reference — Gorilla-XOR style

# Maximum number of columns: the segment field index is an i16
# (reference types.rs:142-148).
MAX_COLUMNS = 32767


@dataclass
class TimeSeriesTableMetadata:
    """Metadata for one time series table (reference types.rs:76-98).

    ``field_columns`` maps field name -> ErrorBound in declaration order;
    ``field_index_of`` assigns each stored field its i16 ``field_column``
    physical partition value (index within the *query schema*, matching
    the reference where the segment field index is the column's position).
    """

    name: str
    timestamp_column: str
    field_columns: dict[str, ErrorBound] = field(default_factory=dict)
    tag_columns: list[str] = field(default_factory=list)
    generated_columns: list[GeneratedColumn] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not self.field_columns:
            raise ValueError("a time series table requires at least one stored FIELD column")
        total = 1 + len(self.field_columns) + len(self.tag_columns) + len(self.generated_columns)
        if total > MAX_COLUMNS:
            raise ValueError(f"too many columns: {total} > {MAX_COLUMNS}")
        gen_names = {g.name for g in self.generated_columns}
        overlap = gen_names & set(self.field_columns)
        if overlap:
            raise ValueError(f"generated columns clash with stored fields: {overlap}")

    @property
    def field_names(self) -> list[str]:
        return list(self.field_columns)

    @property
    def field_index_of(self) -> dict[str, int]:
        """Stored field name -> physical field_column partition value."""
        return {name: i for i, name in enumerate(self.field_columns)}

    def to_create_sql(self) -> str:
        """Reconstruct the CREATE TIME SERIES TABLE statement (the
        dialect parser round-trips it) — used to replicate tables to
        cluster peers over the Flight CreateTable action."""
        cols = [f"{self.timestamp_column} TIMESTAMP"]
        for name, bound in self.field_columns.items():
            if bound.kind == ErrorBoundKind.ABSOLUTE:
                cols.append(f"{name} FIELD({bound.value})")
            elif bound.kind == ErrorBoundKind.RELATIVE:
                cols.append(f"{name} FIELD({bound.value}%)")
            else:
                cols.append(f"{name} FIELD")
        cols += [f"{g.name} FIELD AS ({g.expr_sql})" for g in self.generated_columns]
        cols += [f"{t} TAG" for t in self.tag_columns]
        return f"CREATE TIME SERIES TABLE {self.name}({', '.join(cols)})"

    def insert_schema(self) -> T.StructType:
        """Schema of data the user writes: timestamp, stored fields, tags
        (generated columns excluded — reference types.rs:167-185)."""
        fields = [T.StructField(self.timestamp_column, T.TimestampType(), False)]
        fields += [T.StructField(f, T.FloatType(), False) for f in self.field_columns]
        fields += [T.StructField(t, T.StringType(), False) for t in self.tag_columns]
        return T.StructType(fields)

    def query_schema(self) -> T.StructType:
        """Schema of data the user reads: insert schema + generated columns."""
        base = self.insert_schema()
        fields = list(base.fields)
        for g in self.generated_columns:
            fields.append(T.StructField(g.name, T.FloatType(), True))
        return T.StructType(fields)

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "timestamp_column": self.timestamp_column,
            "field_columns": {k: v.to_json() for k, v in self.field_columns.items()},
            "tag_columns": list(self.tag_columns),
            "generated_columns": [g.to_json() for g in self.generated_columns],
        }

    @staticmethod
    def from_json(d: dict) -> "TimeSeriesTableMetadata":
        return TimeSeriesTableMetadata(
            name=d["name"],
            timestamp_column=d["timestamp_column"],
            field_columns={k: ErrorBound.from_json(v) for k, v in d["field_columns"].items()},
            tag_columns=list(d["tag_columns"]),
            generated_columns=[GeneratedColumn.from_json(g) for g in d["generated_columns"]],
        )


def segment_schema(tag_columns: list[str]) -> T.StructType:
    """Physical compressed-segment schema (reference schemas.rs:28-52).

    One row = one model segment of one univariate series (one field of one
    tag combination). Spark-first divergences from the reference layout:

    - ``value_count`` (int) and ``seg_sum`` (double) are explicit columns.
      The reference derives segment length from the timestamps binary and
      computes SUM closed-form per model (models/mod.rs:98-184); storing
      them as plain columns lets COUNT/SUM/AVG pushdown run as pure
      JVM-side Column aggregation over the stats columns — no binary
      decode, no Python — which is the right trade at 100 TB (two extra
      int/double columns vs. a full decode per aggregate query).
      ``seg_sum`` is the f64 sum of the *reconstructed* values, so
      segment-pushdown SUM/AVG equals gridded SUM/AVG exactly (modulo
      f64 addition order).
    - ``ts_kind`` (0 = regular arithmetic sequence, 1 = irregular) and
      the model parameters ``param0``/``param1`` (PMC: mean; Swing: v0 +
      slope) are explicit numeric columns. They make PMC-Mean and Swing
      segments with regular timestamps reconstructable by pure JVM
      Column algebra — ``explode(sequence(...))`` + line arithmetic
      inside whole-stage codegen, no Python worker — which is the grid
      fast path for well-modeled (real sensor) data. Parquet footer
      max-statistics on ``model_type_id``/``ts_kind`` additionally let
      the commit log mark files as all-fast so reads skip the Python
      decode branch entirely. Gorilla segments leave the params null.
    - ``timestamps``/``values`` binary payloads use simplified encodings
      (see compression/encoding.py) — query-visible semantics match the
      reference; byte layouts intentionally do not.
    """
    fields = [
        T.StructField("model_type_id", T.ByteType(), False),
        T.StructField("start_time", T.LongType(), False),  # epoch microseconds
        T.StructField("end_time", T.LongType(), False),
        T.StructField("timestamps", T.BinaryType(), False),
        T.StructField("min_value", T.FloatType(), False),
        T.StructField("max_value", T.FloatType(), False),
        T.StructField("values", T.BinaryType(), False),
        T.StructField("residuals", T.BinaryType(), False),
        T.StructField("error", T.FloatType(), False),
        T.StructField("value_count", T.IntegerType(), False),
        T.StructField("seg_sum", T.DoubleType(), False),
        # nullable: folders written before variance pushdown existed lack
        # it; readers NaN-poison rather than silently miscount (aggregates.py)
        T.StructField("seg_sum_sq", T.DoubleType(), True),
        T.StructField("ts_kind", T.ByteType(), False),
        T.StructField("param0", T.FloatType(), True),
        T.StructField("param1", T.DoubleType(), True),
        T.StructField("field_column", T.ShortType(), False),
    ]
    # nullable: a null tag value is an unusual but legal series key and
    # must not poison JVM-side string ops
    fields += [T.StructField(t, T.StringType(), True) for t in tag_columns]
    return T.StructType(fields)


# Grid (reconstructed point) schema between operators:
# (timestamp µs long, value float, tag...) — reference schemas.rs:67-72.
def grid_schema(tag_columns: list[str]) -> T.StructType:
    fields = [
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("value", T.FloatType(), False),
    ]
    fields += [T.StructField(t, T.StringType(), True) for t in tag_columns]
    return T.StructType(fields)
