"""Scale probe: replicate the sf0.1 events table N times (disjoint time
ranges so series stay dense) and measure ingest + the headline read
paths. Run with different N to see how cost scales with volume on a
fixed local[32] — the shape (near-linear ingest, flat stats-pushdown)
is the evidence that the partitioning strategy tracks data volume, not
tag cardinality.

Usage: python scripts/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.engine import Engine
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = make_spark(app_name="sparkmodelar-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    span = events.select(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span")
    ).first()["span"] + 1_000_000
    # N disjoint copies shifted in time: same series, N x the points
    rep = None
    for i in range(n):
        c = events.select(
            F.timestamp_micros(F.unix_micros("ts") + F.lit(i * span)).alias("timestamp"),
            F.col("value").cast("float").alias("value"),
            F.col("event_type").alias("etype"),
        )
        rep = c if rep is None else rep.unionByName(c)
    rep = rep.cache()
    rows = rep.count()

    eng = Engine(spark, tempfile.mkdtemp(prefix="scale_probe_"))
    eng.read_sql("CREATE TIME SERIES TABLE sp(timestamp TIMESTAMP, value FIELD, etype TAG)")
    t0 = time.time()
    eng.write("sp", rep)
    t_ingest = time.time() - t0

    t0 = time.time()
    eng.read_sql("SELECT count(value) AS c, avg(value) AS a, var_pop(value) AS v FROM sp").collect()
    t_stats = time.time() - t0

    t0 = time.time()
    eng.read_sql(
        "SELECT etype, count(value) AS n FROM sp "
        "WHERE timestamp >= timestamp '1970-01-01' GROUP BY etype"
    ).collect()
    t_grid = time.time() - t0

    t0 = time.time()
    eng.read_sql(
        "SELECT time_bucket('1 day', timestamp) AS b, etype, "
        "count(value) AS n, sum(value) AS s FROM sp "
        "GROUP BY time_bucket('1 day', timestamp), etype"
    ).collect()
    t_resample = time.time() - t0

    t0 = time.time()
    eng.last_points("sp").collect()
    t_latest = time.time() - t0

    # Retention: expire the first half of the replicated span. Most
    # files fall entirely before the cutoff, so the expected shape is
    # files_removed >> files_rewritten and near-constant wall time —
    # the commit is metadata work, not data work.
    n_files_before = len(eng.folder.log("sp").snapshot().files)
    cutoff_us = int(events.select(F.unix_micros(F.min("ts"))).first()[0] + span * (n // 2))
    t0 = time.time()
    exp = eng.expire("sp", cutoff_us)
    t_expire = time.time() - t0

    import json

    print(json.dumps({
        "n_copies": n, "rows": rows,
        "ingest_sec": round(t_ingest, 2),
        "stats_pushdown_sec": round(t_stats, 2),
        "full_grid_sec": round(t_grid, 2),
        "resample_sec": round(t_resample, 2),
        "last_points_sec": round(t_latest, 2),
        "ingest_rows_per_sec": int(rows / t_ingest),
        "expire_sec": round(t_expire, 2),
        "expire_files_total": n_files_before,
        "expire_files_removed": exp["files_removed"],
        "expire_files_rewritten": exp["files_rewritten"],
    }))


if __name__ == "__main__":
    main()
