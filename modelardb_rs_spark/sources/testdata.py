"""Loaders for the driver-provided testdata tables (TESTDATA.md).

The ``events`` table stores TIMESTAMP(NANOS) which Spark's Parquet
reader rejects by default; ``spark.sql.legacy.parquet.nanosAsLong`` is a
runtime-settable conf, so these loaders set it defensively and normalize
``ts`` to µs TimestampType (matching DuckDB's µs timestamp semantics for
oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes)["ts"] == "bigint":
            # TIMESTAMP(NANOS) read as long; integer division: `/` would
            # go through double and lose ns precision above 2^53
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # µs-precision generation; NTZ → session-TZ (UTC) instant
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
