"""Streaming ingestion tests: file-source micro-batches compress into a
time series table incrementally; windowed rollup produces event-time
aggregates with a watermark."""

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from modelardb_rs_spark.streaming.ingest import start_ingest, windowed_rollup

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("f", T.FloatType(), True),
        T.StructField("tag", T.StringType(), True),
    ]
)


def batch_rows(spark, start, n):
    return spark.createDataFrame(
        [
            Row(
                timestamp=TS0 + datetime.timedelta(seconds=start + i),
                f=float(start + i),
                tag="s" + str((start + i) % 2),
            )
            for i in range(n)
        ],
        INPUT_SCHEMA,
    )


def test_streaming_ingest_incremental(engine, spark, tmp_path):
    engine.read_sql("CREATE TIME SERIES TABLE st(timestamp TIMESTAMP, f FIELD, tag TAG)")
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    batch_rows(spark, 0, 100).write.mode("append").parquet(src)

    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(src)
    q = start_ingest(engine, "st", stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        assert engine.table("st").count() == 100
        batch_rows(spark, 100, 50).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert engine.table("st").count() == 150
    finally:
        q.stop()
    # lossless round trip through the streamed segments
    total = engine.read_sql("SELECT sum(f) AS s FROM st").collect()[0].s
    assert total == sum(range(150))


def test_windowed_rollup(spark, tmp_path):
    src = str(tmp_path / "win_in")
    os.makedirs(src)
    batch_rows(spark, 0, 600).write.mode("append").parquet(src)
    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(src)
    agg = windowed_rollup(stream, "timestamp", "f", ["tag"], window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM rollup_out").collect()
    finally:
        q.stop()
    # 600 seconds of data -> two 5-minute windows x two tags
    assert len(rows) == 4
    assert {r.n for r in rows} == {150}
    assert all(r.window_end > r.window_start for r in rows)
