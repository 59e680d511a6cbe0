"""Document-pipeline scale probe: replicate the sf0.1 documents table
N times (fresh doc_ids, mutated text so replicas are near-dups rather
than exact copies) and measure the LLM-pipeline operators' cost shape.
The evidence sought: each operator's wall time grows ~linearly in the
corpus (they are O(total tokens/lines/shingles)), never quadratically
(no all-pairs path).

Usage: python scripts/scale_probe_docs.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.operators import dedup as dedup_ops
from modelardb_rs_spark.operators import lines as line_ops
from modelardb_rs_spark.operators import pii as pii_ops
from modelardb_rs_spark.operators import text as text_ops
from modelardb_rs_spark.operators.filtering import FilterPolicy, rejection_stats
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = make_spark(app_name="sparkmodelar-docs-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    base = docs.count()
    rep = None
    for i in range(n):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # replica i prepends a distinct token: near-dup of the
            # original (high Jaccard), not byte-identical
            F.concat(F.lit(f"copy{i} "), F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        )
        rep = c if rep is None else rep.unionByName(c)
    rep = rep.repartition(spark.sparkContext.defaultParallelism).cache()
    rows = rep.count()

    timings = {}

    def clock(name, df):
        t0 = time.time()
        df.count()
        timings[name] = round(time.time() - t0, 2)

    clock("exact_dedup", dedup_ops.exact_duplicate_groups(rep))
    clock("minhash_sigs", dedup_ops.minhash_signatures(rep))
    clock(
        "minhash_lsh_pairs",
        dedup_ops.lsh_candidate_pairs(dedup_ops.minhash_signatures(rep), bands=8),
    )
    clock("line_dedup", line_ops.remove_common_lines(rep))
    clock("pii", pii_ops.pii_counts(rep))
    clock("unigram_lm", text_ops.unigram_lm_scores(rep))
    clock(
        "quality_filter",
        rejection_stats(rep, FilterPolicy(min_tokens=20, languages=("en",), max_pii=0)),
    )
    from modelardb_rs_spark.operators.packing import pack_documents
    from modelardb_rs_spark.operators.spans import duplicated_spans

    clock("pack_sequences", pack_documents(rep, 2048))
    # worst case by construction: EVERY replica group shares its whole
    # text, so nearly every token position is a duplicated 20-gram
    clock("span_dedup", duplicated_spans(rep, span=20, min_dups=2))

    print(json.dumps({"n_copies": n, "docs": rows, "base_docs": base, **timings}))


if __name__ == "__main__":
    main()
