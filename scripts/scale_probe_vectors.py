"""Vector-path scale probe: the ANN scoring paths at >= 4M encoded
rows — the scale the round-4 verdict asked the two-phase top-k and
IVF-PQ work to be measured at.

Corpus: the sf embeddings table (2000 x 64-dim at sf0.1) replicated
N x with a deterministic per-copy perturbation (JVM `transform`, no
Python), written to parquet so every path reads a real table.

Measured, all with |Q|=8 queries, k=10:
  - brute_force_topk: exact cosine over raw vectors (the baseline
    every ANN path must beat at scale),
  - pq_encode: JVM literal-folded ADC encoding of the full corpus,
  - pq_topk (flat ADC + rerank=50) with the default two-phase rank
    limit (SPARK-37099) vs the SAME query with
    spark.sql.optimizer.windowGroupLimitThreshold=0 — a direct A/B of
    the rank-limit pushdown on a corpus-sized scored set,
  - build_ivfpq_index + ivfpq_topk (nprobe 4 of 16 buckets): the
    composition that replaces the flat scan with probed-bucket ADC.

Usage: python scripts/scale_probe_vectors.py [N_copies] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.engine import Engine
from modelardb_rs_spark.operators import ann_index as ann
from modelardb_rs_spark.operators import pq as pq_ops
from modelardb_rs_spark.operators import similarity as sim
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = make_spark(app_name="sparkmodelar-vector-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "embeddings")
    queries = base.limit(8).persist()
    queries.count()

    work = tempfile.mkdtemp(prefix="vector_probe_")
    corpus_path = os.path.join(work, "corpus.parquet")
    # Per-copy perturbation keeps every replica a distinct vector while
    # staying JVM-side and deterministic (no RNG — see Workflow note on
    # seeded hashes; sin(copy * x) varies smoothly per copy and dim).
    (
        base.crossJoin(
            spark.range(n_copies).select(F.col("id").cast("int").alias("copy"))
        )
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (x + F.sin(F.col("copy") * x) * F.lit(0.05)).cast("float"),
            ).alias("embedding"),
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    corpus = spark.read.parquet(corpus_path)
    n_rows = corpus.count()
    out: dict = {"n_copies": n_copies, "rows": n_rows, "dim": 64, "k": 10, "queries": 8}

    t0 = time.time()
    n = sim.brute_force_topk(corpus, queries, k=10).count()
    out["brute_force_secs"] = round(time.time() - t0, 1)
    assert n == 80, n

    books = pq_ops.train_pq_codebooks(base, m=8, ks=16)
    enc_path = os.path.join(work, "encoded.parquet")
    t0 = time.time()
    pq_ops.encode_pq(corpus, books).write.mode("overwrite").parquet(enc_path)
    out["pq_encode_secs"] = round(time.time() - t0, 1)
    encoded = spark.read.parquet(enc_path)

    t0 = time.time()
    n = pq_ops.pq_topk(encoded, books, queries, k=10, rerank=50).count()
    out["pq_topk_secs"] = round(time.time() - t0, 1)
    assert n == 80, n

    # A/B: same flat-ADC query with the rank-limit pushdown DISABLED —
    # every scored row then crosses the exchange into a full per-query
    # sort, the shape ranked_topk's docstring says we avoid.
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", 0)
    try:
        t0 = time.time()
        pq_ops.pq_topk(encoded, books, queries, k=10, rerank=50).count()
        out["pq_topk_no_ranklimit_secs"] = round(time.time() - t0, 1)
    finally:
        spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")

    eng = Engine(spark, os.path.join(work, "folder"))
    t0 = time.time()
    ann.build_ivfpq_index(eng, "probe_vecs", corpus, n_buckets=16, m=8, ks=16)
    out["ivfpq_build_secs"] = round(time.time() - t0, 1)
    t0 = time.time()
    n = ann.ivfpq_topk(eng, "probe_vecs", queries, k=10, nprobe=4, rerank=50).count()
    out["ivfpq_topk_secs"] = round(time.time() - t0, 1)
    assert n == 80, n

    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
