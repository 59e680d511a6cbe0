"""Document-pipeline scale probe: replicate the sf0.1 documents table
N times and measure the LLM-pipeline operators' cost shape. The
evidence sought: each operator's wall time grows ~linearly in the
corpus (they are O(total tokens/lines/shingles)), never quadratically
(no all-pairs path).

Replication scheme (round 4): replicas 0..3 are TRUE near-dups of the
original (distinct leading token, Jaccard ~1) so dedup always has real
work; replicas >= 4 weave a replica-unique token between every word
(`regexp_replace(' ' -> ' x{i}q ')`), which destroys every shared
shingle — duplicate-GROUP size stays bounded at 4 no matter how large
N grows, the way a real corpus behaves. (The round-3 scheme made all N
replicas mutual near-dups, so beyond ~100x the TRUE candidate output
itself is quadratic and the probe measures output size, not operator
cost.)

Usage: python scripts/scale_probe_docs.py [N] [sf_dir] [pack_partitions]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
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


def replicate(docs, n: int):
    parts = []
    for i in range(n):
        if i < 4:
            text = F.concat(F.lit(f"copy{i} "), F.col("text"))
        else:
            text = F.regexp_replace(F.col("text"), " ", f" x{i}q ")
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    pack_partitions = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = make_spark(app_name="sparkmodelar-docs-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    base = docs.count()
    rep = (
        replicate(docs, n)
        .repartition(max(spark.sparkContext.defaultParallelism, n // 8))
        .persist()
    )
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
    from modelardb_rs_spark.operators.spans import duplicated_spans, remove_duplicated_spans

    clock("pack_sequences", pack_documents(rep, 2048))
    if pack_partitions:
        # thousands of partitions: stress the per-partition-totals
        # driver collect (P tiny rows) and the broadcast base-offset join
        clock(
            f"pack_sequences_p{pack_partitions}",
            pack_documents(rep, 2048, num_partitions=pack_partitions),
        )
    clock("span_dedup", duplicated_spans(rep, span=20, min_dups=2))

    # end-to-end cleaning chain (line dedup -> PII redact -> span
    # removal -> length gate), the doc_clean_pipeline composition
    t0 = time.time()
    cleaned_lines = line_ops.remove_common_lines(rep)
    redacted = pii_ops.redact_documents(cleaned_lines)
    despanned = remove_duplicated_spans(redacted, span=20, min_dups=2)
    survivors = despanned.where(text_ops.token_count(F.col("text")) >= 20)
    survivors.count()
    timings["clean_pipeline"] = round(time.time() - t0, 2)

    # persisted MinHash index: build over the corpus, then check a
    # 10k-doc batch against it (the streaming-ingest shape)
    from modelardb_rs_spark.engine import Engine
    from modelardb_rs_spark.operators import dedup_index as ndi

    eng = Engine(spark, tempfile.mkdtemp(prefix="docs_probe_idx_"))
    t0 = time.time()
    ndi.build_minhash_index(eng, "probe_idx", rep)
    timings["minhash_index_build"] = round(time.time() - t0, 2)
    batch = rep.limit(10_000)
    t0 = time.time()
    ndi.near_dup_check(eng, "probe_idx", batch).count()
    timings["minhash_index_check_10k"] = round(time.time() - t0, 2)

    print(json.dumps({"n_copies": n, "docs": rows, "base_docs": base, **timings}))


if __name__ == "__main__":
    main()
