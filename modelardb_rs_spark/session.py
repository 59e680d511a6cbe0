"""SparkSession factory with engine-appropriate defaults.

Local testing runs ``local[N]``; the same configuration is correct on a
multi-executor cluster (AQE, Arrow, UTC timestamps, shuffle partitions
sized by the caller for the deployment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_spark(
    app_name: str = "sparkmodelar",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for this engine.

    Defaults: AQE on (runtime re-planning + skew-join handling at scale),
    Arrow on (fast pandas-UDF interchange for the compression/decode hot
    path), UTC session timezone (stable cross-engine timestamp semantics),
    shuffle partitions sized to the local core count rather than the 200
    default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
