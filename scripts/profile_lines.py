"""Repeated per-entry timing for optimization work: run each named
entry N times in one session and report min/median — the bench's
single-shot suite order is too noisy for before/after comparisons on a
loaded host (BASELINE.md documents >2x session swings).

Usage: python scripts/profile_lines.py [-n reps] <entry> [entry ...]

Caches are NOT cleared between reps (mirrors the bench: index builds
clear their caches once up front via bench-equivalent clears when the
entry manages its own cache family). Pass --clear kind1,kind2 to clear
cache kinds before EACH rep (e.g. annidx to re-time the build itself).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    clear_kinds: tuple[str, ...] = ()
    names = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--clear":
            clear_kinds = tuple(args[i + 1].split(",")); i += 2
        else:
            names.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(app_name="profile-lines")
    qs = entry.queries()
    # standard warmup (bench-equivalent)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1.0,)], "x double").mapInPandas(
        lambda it: it, schema="x double"
    ).collect()
    for name in names:
        runs = []
        for r in range(reps):
            if clear_kinds:
                entry.clear_caches(kinds=clear_kinds)
            spark.sparkContext.setJobDescription(f"{name} rep {r}")
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            runs.append(time.time() - t0)
        runs_s = ", ".join(f"{x:.3f}" for x in runs)
        print(
            f"{name}: min {min(runs):.3f} med {statistics.median(runs):.3f} "
            f"[{runs_s}]", flush=True,
        )


if __name__ == "__main__":
    main()
