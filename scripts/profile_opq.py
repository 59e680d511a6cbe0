"""Phase-level profiling of sim_ivfpq_opq (VERDICT r13 task 1).

Wraps the build/probe internals with wall-clock timers, clears the
annidx cache so the timed call pays the full OPQ build exactly as the
bench suite does, and prints a per-phase breakdown.
"""

from __future__ import annotations

import functools
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark


def wrap(obj, name, label=None, acc=None):
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def timed(*a, **k):
        t0 = time.time()
        r = fn(*a, **k)
        dt = time.time() - t0
        acc.append((label or name, dt))
        return r

    setattr(obj, name, timed)
    return fn


def main():
    acc: list[tuple[str, float]] = []
    spark = make_spark(app_name="profile-opq")
    # generic warmup as the bench does
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1.0,)], "x double").mapInPandas(
        lambda it: it, schema="x double"
    ).collect()

    from modelardb_rs_spark.operators import ann_index, pq, similarity
    from modelardb_rs_spark.engine import Engine

    wrap(similarity, "numpy_kmeans_buckets", acc=acc)
    wrap(pq, "train_opq", acc=acc)
    wrap(pq, "encode_pq", acc=acc)
    wrap(ann_index, "build_ivfpq_index", acc=acc)
    wrap(ann_index, "ivfpq_topk", acc=acc)
    wrap(similarity, "brute_force_topk", acc=acc)
    wrap(Engine, "write", label="engine.write", acc=acc)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "2"))
    for i in range(reps):
        entry.clear_caches(kinds=("annidx",))
        acc.clear()
        t0 = time.time()
        entry.sim_ivfpq_opq(spark, sf_dir).count()
        total = time.time() - t0
        print(f"--- rep {i}: total {total:.2f}s ---")
        for label, dt in acc:
            print(f"  {label:28s} {dt:6.2f}s")
        covered = sum(
            dt for label, dt in acc
            if label in ("build_ivfpq_index", "ivfpq_topk", "brute_force_topk")
        )
        print(f"  (covered {covered:.2f}s, uncovered {total - covered:.2f}s)")


if __name__ == "__main__":
    main()
