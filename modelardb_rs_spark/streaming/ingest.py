"""Structured Streaming ingestion — the reference's buffering ingest
pipeline (crates/modelardb_server/src/storage/: IngestedDataBuffer →
per-series buffers → compression threads → Delta writer, with a WAL for
durability) re-expressed as micro-batch compression jobs.

Spark-first mapping (SURVEY.md §2.8):
- the channel/thread pipeline is a ``writeStream.foreachBatch`` loop —
  each micro-batch runs the same shuffle-parallel compress+write used by
  batch ingestion (operators/compress.py),
- WAL durability/exactly-once is the streaming checkpoint (source
  offsets + batch id commit log) instead of a bespoke Arrow-IPC log,
- per-series buffering/spill is Spark's own shuffle machinery,
- FlushMemory/FlushNode Flight actions map to
  ``query.processAllAvailable()`` / ``query.stop()``,
- cross-batch out-of-order data keeps the reference's relaxed
  semantics: each batch is compressed independently; segments from
  different batches may overlap in time and queries read them all
  (compression.rs:109-141).

``windowed_rollup`` adds what the reference lacks (and Spark gives for
free): watermarked event-time windows with a late-data policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from modelardb_rs_spark.engine import Engine


def start_ingest(
    engine: Engine,
    table: str,
    stream: DataFrame,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Continuously compress a stream into a time series table.

    ``stream`` must match the table's insert schema. Exactly-once across
    restarts comes from the checkpoint; each micro-batch is compressed
    with the full shuffle-parallel fitter.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.write(table, batch_df)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked event-time window aggregation over a raw point stream
    (count/sum/min/max/avg per window per key); rows later than the
    watermark are dropped per standard Structured Streaming semantics."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
            "sum_value",
            "min_value",
            "max_value",
            "avg_value",
        )
    )
