"""Cluster membership + coordination (manager role): registration with
table replication, random-cloud query routing, DDL fan-out, removal —
reference modelardb_server/src/cluster.rs and
modelardb_storage/src/data_folder/cluster.rs semantics."""

import pytest
from pyspark.sql import functions as F

from modelardb_rs_spark.cluster import Cluster, Node
from modelardb_rs_spark.engine import Engine
from modelardb_rs_spark.flight import start_server


@pytest.fixture()
def cluster_env(spark, tmp_path):
    """A manager over a shared folder plus one edge and one cloud node,
    each a live in-process Flight server over its own folder."""
    manager = Cluster(spark, str(tmp_path / "remote"))
    edge_eng = Engine(spark, str(tmp_path / "edge"))
    cloud_eng = Engine(spark, str(tmp_path / "cloud"))
    edge_srv = start_server(edge_eng)
    cloud_srv = start_server(cloud_eng)
    yield manager, edge_eng, cloud_eng, edge_srv, cloud_srv
    edge_srv.shutdown()
    cloud_srv.shutdown()


def test_register_replicates_tables_and_routes_queries(cluster_env):
    manager, edge_eng, cloud_eng, edge_srv, cloud_srv = cluster_env
    # pre-existing tables in the shared folder are pushed to joiners
    manager.engine.read_sql(
        "CREATE TIME SERIES TABLE m(timestamp TIMESTAMP, v FIELD(0.5), "
        "g FIELD AS (v * 2), tag TAG)"
    )
    manager.engine.create_table("lookup", "id BIGINT, name STRING")

    edge = manager.register_node(f"grpc://127.0.0.1:{edge_srv.port}", "edge")
    cloud = manager.register_node(f"grpc://127.0.0.1:{cloud_srv.port}", "cloud")
    assert {n.mode for n in manager.nodes()} == {"edge", "cloud"}
    assert "m" in edge_eng.tables() and "lookup" in edge_eng.tables()
    assert "m" in cloud_eng.tables()
    # replicated with bounds and generated columns intact
    meta = edge_eng.catalog.time_series_metadata("m")
    assert meta.field_columns["v"].value == 0.5
    assert [g.name for g in meta.generated_columns] == ["g"]

    # query routing: always the cloud node
    for _ in range(5):
        assert manager.query_node() == cloud
    cloud_eng.write(
        "m",
        manager.engine.spark.range(10).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp",
            "CAST(id AS FLOAT) AS v", "'a' AS tag",
        ),
    )
    out = manager.read_sql("SELECT count(v) AS n FROM m")
    assert out["n"].to_pylist() == [10]

    # fan-out union across every node
    edge_eng.write(
        "m",
        manager.engine.spark.range(3).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp",
            "CAST(id AS FLOAT) AS v", "'b' AS tag",
        ),
    )
    both = manager.read_sql_all("SELECT count(v) AS n FROM m")
    assert sorted(both["n"].to_pylist()) == [3, 10]


def test_cluster_key_is_stable(spark, tmp_path):
    a = Cluster(spark, str(tmp_path / "shared"))
    b = Cluster(spark, str(tmp_path / "shared"))
    assert a.key() == b.key() == a.key()


def test_cluster_ddl_fanout_and_removal(cluster_env):
    manager, edge_eng, cloud_eng, edge_srv, cloud_srv = cluster_env
    manager.register_node(f"grpc://127.0.0.1:{edge_srv.port}", "edge")
    manager.register_node(f"grpc://127.0.0.1:{cloud_srv.port}", "cloud")

    manager.create_cluster_table("CREATE TABLE ct(id BIGINT)")
    assert "ct" in manager.engine.tables()
    assert "ct" in edge_eng.tables() and "ct" in cloud_eng.tables()

    edge_eng.spark.range(4).createOrReplaceTempView("ct_src")
    edge_eng.read_sql("INSERT INTO ct SELECT id FROM ct_src")
    manager.truncate_cluster_tables(["ct"])
    assert edge_eng.table("ct").count() == 0

    manager.drop_cluster_tables(["ct"])
    assert "ct" not in edge_eng.tables() and "ct" not in manager.engine.tables()

    # removal: latest action wins; the node stops receiving broadcasts
    manager.remove_node(f"grpc://127.0.0.1:{edge_srv.port}")
    assert [n.mode for n in manager.nodes()] == ["cloud"]
    with pytest.raises(RuntimeError, match="no cloud nodes"):
        Cluster(manager.engine.spark, manager.engine.folder.root + "_none").query_node()


def test_register_rejects_bad_mode_and_dead_node(cluster_env):
    manager, *_ = cluster_env
    with pytest.raises(ValueError, match="mode must be one of"):
        manager.register_node("grpc://127.0.0.1:1", "fog")
    with pytest.raises(Exception):
        manager.register_node("grpc://127.0.0.1:1", "edge")  # nothing listening


def test_read_sql_all_df_streams_bulk_union(cluster_env, spark):
    """The DataFrame fan-out must relay each node's result with bounded
    driver memory: large per-node results spill to shared-storage
    staging, small ones stay in memory — never a whole-cluster
    concat_tables on the driver."""
    from modelardb_rs_spark import flight as flight_mod

    manager, edge_eng, cloud_eng, edge_srv, cloud_srv = cluster_env
    manager.register_node(f"grpc://127.0.0.1:{edge_srv.port}", "edge")
    manager.register_node(f"grpc://127.0.0.1:{cloud_srv.port}", "cloud")
    for eng, base in ((edge_eng, 0), (cloud_eng, 1_000_000)):
        eng.create_table("b", "id BIGINT")
        eng.write("b", spark.range(base, base + 120_000).select("id"))
    spills = []
    fs = manager.engine.folder.fs
    real_write_bytes = fs.write_bytes

    def counting(uri, data):
        if "/_staging/relay-" in uri:
            spills.append(len(data))
        return real_write_bytes(uri, data)

    fs.write_bytes = counting
    real_spill = flight_mod._RELAY_SPILL_BYTES
    flight_mod._RELAY_SPILL_BYTES = 256 << 10
    try:
        df = manager.read_sql_all_df("SELECT id FROM b")
        assert df.count() == 240_000
        s = df.agg(F.sum("id").alias("s")).collect()[0]["s"]
        expect = sum(range(120_000)) + sum(range(1_000_000, 1_120_000))
        assert s == expect
    finally:
        flight_mod._RELAY_SPILL_BYTES = real_spill
        fs.write_bytes = real_write_bytes
    assert len(spills) >= 2, spills
    assert max(spills) < 4 * (256 << 10), max(spills)
