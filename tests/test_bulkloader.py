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


def test_export_delta_log_is_spec_conformant(engine, spark, tmp_path):
    """export_delta writes Parquet + a _delta_log commit following the
    public Delta PROTOCOL.md: protocol/metaData/add actions, Spark-JSON
    schemaString, per-file partitionValues and sizes. (No stock Delta
    reader ships in this container, so conformance is structural; the
    parquet payload itself must round-trip the exported rows.)"""
    import json
    import os

    from pyspark.sql import types as T

    from modelardb_rs_spark.sources.bulkloader import export_delta

    engine.create_table("d", "id BIGINT, grp STRING, v DOUBLE")
    spark.range(100).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp", "id * 0.5 AS v"
    ).createOrReplaceTempView("d_src")
    engine.read_sql("INSERT INTO d SELECT * FROM d_src")

    out = str(tmp_path / "delta_out")
    res = export_delta(engine, "SELECT id, grp, v FROM d", out, partition_by=["grp"])
    assert res["rows"] == 100 and res["files"] >= 2

    log = os.path.join(out, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log) if l.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert {"protocol", "metaData"} <= set(kinds)
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    md = next(a["metaData"] for a in actions if "metaData" in a)
    # schemaString is the Spark StructType JSON the Delta spec requires
    schema = T.StructType.fromJson(json.loads(md["schemaString"]))
    assert [f.name for f in schema.fields] == ["id", "grp", "v"]
    assert md["partitionColumns"] == ["grp"]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == res["files"]
    for add in adds:
        fpath = os.path.join(out, add["path"])
        assert os.path.isfile(fpath)
        assert os.path.getsize(fpath) == add["size"]
        assert add["partitionValues"]["grp"] in ("even", "odd")
        assert add["dataChange"] is True
    # the data files referenced by the log hold exactly the export
    back = spark.read.option("basePath", out).parquet(
        *[os.path.join(out, a["path"]) for a in adds]
    )
    assert back.count() == 100
    assert sorted(r.id for r in back.collect()) == list(range(100))
