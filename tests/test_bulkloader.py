"""Bulk import/export round trip (the modelardbb CLI surface)."""

import datetime

from pyspark.sql import Row

from modelardb_rs_spark.sources.bulkloader import export_parquet, import_parquet

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def test_import_export_roundtrip(engine, spark, tmp_path):
    src = str(tmp_path / "src_parquet")
    spark.createDataFrame(
        [
            Row(
                timestamp=TS0 + datetime.timedelta(seconds=i),
                f=float(i),  # double in parquet; engine field is float32
                tag="a",
            )
            for i in range(50)
        ]
    ).write.parquet(src)

    n = import_parquet(
        engine,
        "bulk_ts",
        src,
        pre_sql=["CREATE TIME SERIES TABLE bulk_ts(timestamp TIMESTAMP, f FIELD, tag TAG)"],
        cast_double_to_float=True,
    )
    assert n == 50
    assert engine.table("bulk_ts").count() == 50

    out = str(tmp_path / "export_parquet")
    export_parquet(engine, "SELECT * FROM bulk_ts", out, partition_by=["tag"])
    back = spark.read.parquet(out)
    assert back.count() == 50
    assert set(back.columns) == {"timestamp", "f", "tag"}


def test_engine_stats(engine, spark):
    engine.read_sql("CREATE TIME SERIES TABLE s(timestamp TIMESTAMP, f FIELD, tag TAG)")
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), f=7.0, tag="a") for i in range(200)
    ]
    engine.write("s", spark.createDataFrame(rows))
    stats = engine.stats("s").collect()
    assert len(stats) == 1
    assert stats[0].model_type_id == 0  # constant series -> PMC-Mean
    assert stats[0].n_points == 200
