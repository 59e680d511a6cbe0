"""As-of hot-key probe (round-10): where does the two-pass
time-bucketed plan (asof_join(hot_key_buckets=N)) beat the one-pass
window on a dominating key?

The one-pass plan serializes a hot key into ONE task's external sort
(AQE does not split window partitions); the two-pass plan splits the
time axis into N ranges so the hot key parallelizes across N tasks, at
the cost of one min/max job plus the per-(key, bucket) seed pass. This
probe times both on a synthetic 100%-hot-key corpus (every row on one
key — the documented worst case) at growing row counts on local[32].

Usage: python scripts/scale_probe_asof_hotkey.py [rows ...]
         (default: 250000 1000000 4000000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from modelardb_rs_spark.operators.asof import asof_join
from modelardb_rs_spark.session import make_spark


def build(spark, n: int):
    # one hot key; left times dense, right times every 4th tick
    left = spark.range(n).select(
        F.lit(0).alias("k"), F.col("id").alias("t"), F.col("id").alias("lv")
    )
    right = spark.range(n // 4).select(
        F.lit(0).alias("k"),
        (F.col("id") * 4 + 1).alias("t"),
        (F.col("id") + 10_000_000).alias("rv"),
    )
    return left, right


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000, 4_000_000]
    spark = make_spark(app_name="asof-hotkey-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = []
    for n in sizes:
        left, right = build(spark, n)
        left = left.cache()
        right = right.cache()
        left.count(), right.count()
        row = {"rows": n}
        for label, kw in (("one_pass", {}), ("buckets_32", {"hot_key_buckets": 32})):
            best = None
            for _ in range(2):
                t0 = time.time()
                asof_join(
                    left, right, on="t", by=["k"], right_value_cols=["rv"], **kw
                ).agg(F.count("rv_right"), F.sum("rv_right")).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 2)
        row["speedup"] = round(row["one_pass"] / row["buckets_32"], 2)
        left.unpersist(), right.unpersist()
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"table": out}), flush=True)


if __name__ == "__main__":
    main()
