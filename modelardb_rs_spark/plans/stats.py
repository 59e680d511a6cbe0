"""Driver-side plan statistics helpers (no jobs triggered)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a plan. Falls back to "huge" when the
    estimate is unavailable so callers default to the scale-safe path."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62
