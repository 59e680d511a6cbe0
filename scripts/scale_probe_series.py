"""Series-cardinality scale probe: many series, few points each — the
axis orthogonal to scale_probe.py's volume replication. A fleet of a
million sensors reporting hourly stresses per-series STATE (buffering,
grouping, last-observation reads), not bytes.

What the shapes should show:
- ingest: when tag cardinality exceeds the target parallelism the
  stats pass short-circuits to hash-on-tags (compress.py), so wall
  time tracks rows, and the per-series driver plan never materializes;
- last_points / series_spans: O(series) outputs answered from segment
  metadata — cost tracks series count, never point count;
- stats pushdown: flat — narrow columns regardless of cardinality.

Usage: python scripts/scale_probe_series.py [n_series] [points_per_series]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.engine import Engine
from modelardb_rs_spark.session import make_spark


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    ppser = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = make_spark(app_name="sparkmodelar-series-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = (
        spark.range(n_series * ppser)
        .select(
            F.concat(F.lit("s"), (F.col("id") % n_series)).alias("tag"),
            F.timestamp_micros(
                (F.col("id") / n_series).cast("long") * 60_000_000
            ).alias("timestamp"),
            (F.col("id") % 97).cast("float").alias("value"),
        )
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="series_probe_"))
    eng.read_sql(
        "CREATE TIME SERIES TABLE sp(timestamp TIMESTAMP, value FIELD, tag TAG)"
    )
    t0 = time.time()
    eng.write("sp", rows)
    t_ingest = time.time() - t0

    t0 = time.time()
    n_last = eng.last_points("sp").count()
    t_last = time.time() - t0
    assert n_last == n_series

    t0 = time.time()
    eng.read_sql("SELECT count(value) AS c, avg(value) AS a FROM sp").collect()
    t_stats = time.time() - t0

    t0 = time.time()
    n_spans = eng.series_spans("sp").count()
    t_spans = time.time() - t0
    assert n_spans == n_series

    print(json.dumps({
        "n_series": n_series,
        "rows": n_series * ppser,
        "ingest_sec": round(t_ingest, 2),
        "last_points_sec": round(t_last, 2),
        "stats_pushdown_sec": round(t_stats, 2),
        "series_spans_sec": round(t_spans, 2),
    }))


if __name__ == "__main__":
    main()
