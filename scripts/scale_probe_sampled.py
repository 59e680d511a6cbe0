"""Shingle-sampling scale probe: measure the candidate-generation
cost drop AND the recall floor of the opt-in `shingle_keep_mod` lever
(operators/dedup.py) on the bounded-dup-group corpus used by
scale_probe_docs.py (replicas 0..3 of every base doc are TRUE
near-dups — Jaccard ~0.97 by construction; later replicas weave a
replica-unique token that destroys cross-group similarity).

Because the duplicate groups are constructed, the ground truth needs
no verification pass: the true pair set is exactly
{(base + i*10M, base + j*10M) : i < j <= 3} per base doc. For each
mod in MODS the probe times signatures + banded LSH candidate pairs
(the ~1300s line of the round-4 probe at N=800) and reports
candidate-level recall against that constructed truth — the precise
quantity sampling trades (verification is exact and unsampled in the
pipeline, so pair precision is structural).

Usage: python scripts/scale_probe_sampled.py [N] [sf_dir] [mods_csv]
         [max_bucket]

``max_bucket`` (optional) applies the LSH bucket-size cap to every mod
in the run — the structural mitigation for the sampled-variance
candidate inflation this probe measured at N=800/mod=4 (the candidate
distinct's shuffle overflowed the disk; SCALE.md "Round-7").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.operators import dedup as dedup_ops
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table
from scale_probe_docs import replicate


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mods = [int(m) for m in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "4", "8"])]
    # an integer applies the manual cap; the literal string "auto" uses
    # the median-anchored data-sized rule (max(auto_cap_floor,
    # auto_cap_median_mult x median bucket size) — the tail-quantile
    # p99.9 alternative was measured and rejected, SCALE.md "Round-8")
    max_bucket = (
        None
        if len(sys.argv) <= 4
        else ("auto" if sys.argv[4] == "auto" else int(sys.argv[4]))
    )
    spark = make_spark(app_name="sparkmodelar-sampled-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    rep = (
        replicate(docs, n)
        .repartition(max(spark.sparkContext.defaultParallelism, n // 8))
        .persist()
    )
    rows = rep.count()

    # Constructed truth: every unordered pair of replicas 0..3 per base.
    pairs_ij = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    truth = (
        docs.select("doc_id")
        .crossJoin(spark.createDataFrame(pairs_ij, "i int, j int"))
        .select(
            (F.col("doc_id") + F.col("i") * 10_000_000).alias("id_a"),
            (F.col("doc_id") + F.col("j") * 10_000_000).alias("id_b"),
        )
        .persist()
    )
    n_truth = truth.count()

    out = {
        "n_copies": n,
        "docs": rows,
        "true_pairs": n_truth,
        "max_bucket": max_bucket,
        "mods": {},
    }
    for mod in mods:
        # ONE pass over the candidate set: the band join + distinct run
        # exactly as in production (that IS the measured cost), but the
        # result streams through a broadcast-join flag + partial count —
        # persisting billions of candidate pairs just to count them twice
        # is what filled the disk on the first attempt at this probe.
        t0 = time.time()
        sigs = dedup_ops.minhash_signatures(rep, k=16, n=3, shingle_keep_mod=mod)
        cands = dedup_ops.lsh_candidate_pairs(sigs, bands=8, max_bucket=max_bucket)
        agg = (
            cands.join(
                F.broadcast(truth.withColumn("__t__", F.lit(1))),
                ["id_a", "id_b"],
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_cands"),
                F.count("__t__").alias("hits"),
            )
            .first()
        )
        cand_secs = round(time.time() - t0, 2)
        entry = {
            "candidate_secs": cand_secs,
            "n_candidates": agg["n_cands"],
            "recall_of_true_pairs": round(agg["hits"] / max(n_truth, 1), 4),
        }
        out["mods"][str(mod)] = entry
        print(json.dumps({"mod": mod, **entry}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
