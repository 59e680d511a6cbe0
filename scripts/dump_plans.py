"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
  tag     e.g. r13  -> files land in plans/r13/
  suffix  e.g. before | after
  query   names from entry.queries(); default = the bench HEADLINE list.

Building a query's DataFrame may run Spark jobs (index builds, metadata
collects) — that is part of the entry's real shape; the dumped plan is
the plan of the RETURNED frame, which is what the timed .count() runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(app_name="plan-dump")
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"ERROR building/dumping plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
