"""Phase-level profiling of the ANN index bench lines (r14 §1 measure).

Runs each line cold (cleared annidx/maintidx caches) and warm, printing
a per-phase wall-clock breakdown.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark

ACC: list[tuple[int, str, float]] = []
DEPTH = [0]


def wrap(obj, name, label=None):
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def timed(*a, **k):
        d = DEPTH[0]
        DEPTH[0] += 1
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            DEPTH[0] -= 1
            ACC.append((d, label or name, time.time() - t0))

    setattr(obj, name, timed)
    return fn


def main():
    spark = make_spark(app_name="profile-ann")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1.0,)], "x double").mapInPandas(
        lambda it: it, schema="x double"
    ).collect()

    from modelardb_rs_spark.operators import ann_index, pq, similarity
    from modelardb_rs_spark.engine import Engine

    for name in (
        "build_ivf_index", "build_ivfpq_index", "ivf_index_topk",
        "ivfpq_topk", "append_to_ivf_index", "ivf_index_maintenance",
        "ivf_index_stats", "numpy_kmeans_buckets",
    ):
        if hasattr(ann_index, name):
            wrap(ann_index, name)
    wrap(pq, "train_opq")
    wrap(pq, "train_pq_codebooks")
    wrap(pq, "_driver_sample")
    wrap(similarity, "bucket_centroids")
    wrap(similarity, "brute_force_topk")
    wrap(similarity, "probe_topk")
    wrap(Engine, "write", label="engine.write")
    wrap(Engine, "overwrite", label="engine.overwrite")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lines = os.environ.get(
        "LINES", "sim_ivf_index,sim_ivfpq_topk,sim_ivfpq_opq,sim_index_maintenance"
    ).split(",")
    qs = entry.queries()
    for line in lines:
        entry.clear_caches(kinds=("annidx", "maintidx"))
        for mode in ("cold", "warm"):
            ACC.clear()
            t0 = time.time()
            qs[line](spark, sf_dir).count()
            total = time.time() - t0
            print(f"=== {line} [{mode}]: total {total:.2f}s ===")
            for d, label, dt in ACC:
                print(f"  {'  ' * d}{label:32s} {dt:6.2f}s")


if __name__ == "__main__":
    main()
