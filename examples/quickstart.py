"""End-to-end tour of the engine on the bundled test data.

Run from the repo root:

    python examples/quickstart.py [sf_dir]

Creates a data folder under /tmp, ingests the events stream as a
compressed time series table, and walks the read surface: SQL with
model-based pushdown, resample/gapfill/edge reads, anomaly scan, and a
few of the corpus operators over the documents table.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from modelardb_rs_spark import Engine, make_spark
from modelardb_rs_spark.sources.testdata import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = make_spark(app_name="sparkmodelar-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    engine = Engine(spark, tempfile.mkdtemp(prefix="quickstart_"))
    engine.read_sql(
        "CREATE TIME SERIES TABLE events(timestamp TIMESTAMP, "
        "value FIELD(0.5), etype TAG)"
    )
    ev = load_table(spark, sf_dir, "events")
    engine.write(
        "events",
        ev.select(
            F.col("ts").alias("timestamp"),
            F.col("value").cast("float").alias("value"),
            F.col("event_type").alias("etype"),
        ),
    )
    print("== storage stats (from segment metadata only)")
    engine.stats("events").show()

    print("== aggregate pushdown: answered from statistics columns, no decode")
    engine.read_sql(
        "SELECT etype, count(value) AS n, avg(value) AS avg, "
        "stddev_samp(value) AS sd FROM events GROUP BY etype"
    ).show()

    print("== resample via SQL time_bucket (closed form for modeled segments)")
    engine.read_sql(
        "SELECT time_bucket('1 day', timestamp) AS day, etype, "
        "count(value) AS n FROM events "
        "GROUP BY time_bucket('1 day', timestamp), etype"
    ).orderBy("day", "etype").show(6)

    print("== last observation per series (O(series) decode)")
    engine.last_points("events").show()

    print("== gap-filled hourly grid (linear interpolation)")
    engine.gapfill("events", "1 hour", "value").orderBy("etype", "bucket").show(6)

    print("== z-score outliers with segment skipping")
    engine.outliers("events", z=1.8).groupBy("etype").count().show()

    print("== corpus operators over the documents table")
    docs = load_table(spark, sf_dir, "documents")
    from modelardb_rs_spark.operators import dedup, text

    text.repetition_features(docs).orderBy(F.desc("top_bigram_frac")).show(3)
    dedup.minhash_signatures(docs).select("doc_id", "h0", "h1").show(3, truncate=24)

    print("== PII scrub + composed quality gate")
    from modelardb_rs_spark.operators import pii
    from modelardb_rs_spark.operators.filtering import FilterPolicy, rejection_stats

    pii.pii_counts(docs).agg(F.sum("n_pii").alias("total_pii_spans")).show()
    rejection_stats(docs, FilterPolicy(min_tokens=30, languages=("en",))).show()

    print("== cross-series correlation and hour-of-day anomalies")
    engine.correlate("events", "value", every="1 day").orderBy(
        F.desc("corr")
    ).show(3)
    engine.seasonal_anomalies("events", "value", z=2.5).groupBy("etype").count().show()

    print("== retention: roll up days older than the cutoff, expire the raw points")
    engine.downsample_expire(
        "events", "events_daily", "1 day", {"value": ["count", "sum"]}, "2024-01-15"
    )
    engine.table("events_daily").orderBy("bucket", "etype").show(4)
    engine.read_sql("SELECT count(value) AS raw_points_left FROM events").show()

    print("== EXPLAIN ANALYZE: runtime decode counters over the SQL surface")
    engine.read_sql(
        "EXPLAIN ANALYZE SELECT count(value) AS n FROM events "
        "WHERE timestamp >= TIMESTAMP '1970-01-01'"
    ).show(truncate=False)

    print("== training-data prep: pack token stream into 512-token sequences")
    from modelardb_rs_spark.operators.packing import pack_documents, stratified_sample

    pack_documents(docs, 512).groupBy("seq_id").agg(
        F.sum("n_tokens").alias("tokens"), F.count("*").alias("docs")
    ).orderBy("seq_id").show(4)

    print("== language-stratified sampling (hash-deterministic)")
    stratified_sample(docs, {"en": 0.5}, "lang", default_rate=1.0).groupBy(
        "lang"
    ).count().show()

    print("== substring/span dedup: repeated passages inside unique docs")
    from modelardb_rs_spark.operators.spans import duplicated_spans

    duplicated_spans(docs, span=10, min_dups=2).groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    ).orderBy(F.desc("dup_tokens")).show(4)

    spark.stop()


if __name__ == "__main__":
    main()
