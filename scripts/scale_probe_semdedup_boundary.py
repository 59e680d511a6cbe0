"""Semantic-dedup cluster-BOUNDARY recall probe (round-8): quantify the
SemDeDup paper's accepted trade — near-dup pairs split across adjacent
k-means clusters are never examined — and measure how much of it the
multi-probe lever (`semantic_near_pairs(nprobe=2)`) buys back, at what
candidate cost.

Corpus: the sf0.1 embeddings (2000 x 64-dim) replicated N x with the
same deterministic ±5% perturbation as scale_probe_semdedup.py, so
copies of one base vector are true near-dups — PLUS planted
boundary-straddling pairs: for each consecutive base pair (b, b+1),
two vectors mixed 51/49 and 49/51 between the two bases. Their mutual
cosine is ~0.9992 (a true near-dup at the 0.999 threshold) but each
leans toward a DIFFERENT base, so whenever the two bases cluster
apart, k-means splits the pair — exactly the boundary geometry the
paper's within-cluster restriction misses. Ground truth is computed
EXACTLY (not assumed): same-base replica pairs and planted pairs are
kept only when their measured cosine >= threshold — base-keyed
equi-joins, never all-pairs. Recall is reported separately for the
replica pairs (the easy mass) and the planted boundary pairs (the
trade being measured), via broadcast-join aggregates (the
count-in-the-pass-that-produces-it rule from SCALE.md "Round-7").

Usage: python scripts/scale_probe_semdedup_boundary.py [n_copies ...]
         (default 25 50; k is sized for ~500-vector clusters)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from modelardb_rs_spark.operators import similarity as sim
from modelardb_rs_spark.operators.similarity import dot, norm
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import load_table
from scale_probe_semdedup import replicate

THRESHOLD = 0.999


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25, 50]
    spark = make_spark(app_name="sparkmodelar-semdedup-boundary-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    out = {"threshold": THRESHOLD, "runs": []}

    # planted boundary pairs: 51/49 and 49/51 mixes of consecutive bases
    nxt = base.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("__e2__")
    )
    mixes = base.join(nxt, "vec_id").select(
        "vec_id",
        F.zip_with(
            "embedding", "__e2__", lambda a, b: (a * 0.51 + b * 0.49).cast("float")
        ).alias("__v1__"),
        F.zip_with(
            "embedding", "__e2__", lambda a, b: (a * 0.49 + b * 0.51).cast("float")
        ).alias("__v2__"),
    )
    planted = mixes.select(
        (F.col("vec_id") * 2 + 50_000_000).alias("vec_id"), F.col("__v1__").alias("embedding")
    ).unionByName(
        mixes.select(
            (F.col("vec_id") * 2 + 50_000_001).alias("vec_id"),
            F.col("__v2__").alias("embedding"),
        )
    ).persist()
    # keep only planted pairs whose MEASURED cosine clears the threshold
    pv = mixes.select(
        (F.col("vec_id") * 2 + 50_000_000).alias("id_a"),
        (F.col("vec_id") * 2 + 50_000_001).alias("id_b"),
        (
            dot(F.col("__v1__"), F.col("__v2__"))
            / (norm(F.col("__v1__")) * norm(F.col("__v2__")))
        ).alias("__cos__"),
    )
    planted_truth = pv.where(F.col("__cos__") >= THRESHOLD).select("id_a", "id_b").persist()
    n_planted = planted_truth.count()
    out["planted_boundary_pairs"] = n_planted

    for n_copies in sizes:
        corpus = (
            replicate(base, n_copies).unionByName(planted).repartition(32).persist()
        )
        n = corpus.count()
        run = {"n_copies": n_copies, "n_vectors": n}

        # exact truth: same-base replica pairs with cosine >= threshold
        keyed = corpus.where(F.col("vec_id") < 50_000_000).select(
            F.pmod(F.col("vec_id"), F.lit(1_000_000)).alias("__base__"),
            F.col("vec_id"),
            F.col("embedding"),
            norm(F.col("embedding")).alias("__n__"),
        )
        l = keyed.select(
            "__base__",
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("__av__"),
            F.col("__n__").alias("__an__"),
        )
        r = keyed.select(
            "__base__",
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("__bv__"),
            F.col("__n__").alias("__bn__"),
        )
        truth = (
            l.join(r, "__base__")
            .where(F.col("id_a") < F.col("id_b"))
            .where(
                dot(F.col("__av__"), F.col("__bv__"))
                / (F.col("__an__") * F.col("__bn__"))
                >= THRESHOLD
            )
            .select("id_a", "id_b")
            .persist()
        )
        run["true_replica_pairs"] = truth.count()

        k = max(16, n // 500)
        run["k"] = k
        flags = truth.withColumn("__t__", F.lit(1)).unionByName(
            planted_truth.withColumn("__t__", F.lit(2))
        )
        nprobes = tuple(
            int(x)
            for x in os.environ.get("SPARK_GRAFT_NPROBES", "1,2").split(",")
        )
        for nprobe in nprobes:
            t0 = time.time()
            pairs = sim.semantic_near_pairs(
                corpus,
                threshold=THRESHOLD,
                n_clusters=k,
                fit_sample=65536,
                nprobe=nprobe,
            )
            agg = (
                pairs.join(F.broadcast(flags), ["id_a", "id_b"], "left")
                .agg(
                    F.count(F.lit(1)).alias("n_pairs"),
                    F.count(F.when(F.col("__t__") == 1, 1)).alias("hits_rep"),
                    F.count(F.when(F.col("__t__") == 2, 1)).alias("hits_bnd"),
                )
                .first()
            )
            run[f"nprobe{nprobe}"] = {
                "wall_s": round(time.time() - t0, 1),
                "verified_pairs": agg["n_pairs"],
                "recall_replicas": round(
                    agg["hits_rep"] / max(run["true_replica_pairs"], 1), 4
                ),
                "recall_boundary": round(agg["hits_bnd"] / max(n_planted, 1), 4),
            }
        out["runs"].append(run)
        print(json.dumps(run), flush=True)
        corpus.unpersist()
        truth.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
