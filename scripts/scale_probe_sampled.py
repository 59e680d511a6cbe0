"""Shingle-sampling scale probe: measure the candidate-generation
cost drop AND the recall floor of the opt-in `shingle_keep_mod` lever
(operators/dedup.py) on the bounded-dup-group corpus used by
scale_probe_docs.py (replicas 0..3 are TRUE near-dups; later replicas
share no shingles, so the duplicate-group size stays bounded at 4 as
N grows — real-corpus behavior).

For each mod in MODS:
  - time signatures + banded LSH candidate pairs (the ~1300s line of
    the round-4 probe) under that mod,
  - verify the sampled candidates exactly (full shingles) and report
    recall against the UNSAMPLED pipeline's verified pairs.

Usage: python scripts/scale_probe_sampled.py [N] [sf_dir] [mods_csv]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modelardb_rs_spark.operators import dedup as dedup_ops
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table
from scale_probe_docs import replicate


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mods = [int(m) for m in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1", "4", "8"])]
    spark = make_spark(app_name="sparkmodelar-sampled-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    rep = (
        replicate(docs, n)
        .repartition(max(spark.sparkContext.defaultParallelism, n // 8))
        .persist()
    )
    rows = rep.count()

    out = {"n_copies": n, "docs": rows, "mods": {}}
    truth = None
    for mod in mods:
        t0 = time.time()
        sigs = dedup_ops.minhash_signatures(rep, k=16, n=3, shingle_keep_mod=mod)
        cands = dedup_ops.lsh_candidate_pairs(sigs, bands=8)
        n_cands = cands.count()
        cand_secs = round(time.time() - t0, 2)

        t0 = time.time()
        verified = dedup_ops.verify_candidate_pairs(rep, cands, threshold=0.5).select(
            "id_a", "id_b"
        ).persist()
        n_pairs = verified.count()
        verify_secs = round(time.time() - t0, 2)

        entry = {
            "candidate_secs": cand_secs,
            "verify_secs": verify_secs,
            "n_candidates": n_cands,
            "n_verified_pairs": n_pairs,
        }
        if mod == 1 or truth is None:
            truth = verified
            entry["recall_vs_unsampled"] = 1.0 if mod == 1 else None
        else:
            hits = truth.join(verified, ["id_a", "id_b"], "left_semi").count()
            entry["recall_vs_unsampled"] = round(hits / max(truth.count(), 1), 4)
        out["mods"][str(mod)] = entry
        print(json.dumps({"progress": mod, **entry}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
