"""SQL-dialect parser tests (pure, no Spark session): DDL accept/reject
pairs, modeled on the reference parser tests (parser.rs:274-289 for
generated-column validation)."""

import pytest

from modelardb_rs_spark.parser import parse_statement
from modelardb_rs_spark.types import ErrorBound

DDL = "CREATE TIME SERIES TABLE t(timestamp TIMESTAMP, {})"


def parse(cols: str):
    return parse_statement(DDL.format(cols)).ts_metadata


def test_generated_may_reference_stored_columns():
    meta = parse("a FIELD, b FIELD(1.0), g FIELD AS (a + b * 2), tag TAG")
    assert [g.name for g in meta.generated_columns] == ["g"]
    assert meta.field_columns["b"] == ErrorBound.absolute(1.0)


def test_generated_with_functions_and_literals():
    meta = parse("a FIELD, g FIELD AS (round(abs(a), 2) + CAST('1' AS DOUBLE))")
    assert meta.generated_columns[0].expr_sql == "round(abs(a), 2) + CAST('1' AS DOUBLE)"


def test_generated_referencing_generated_rejected():
    with pytest.raises(ValueError, match="references generated column"):
        parse("a FIELD, g1 FIELD AS (a + 1), g2 FIELD AS (g1 * 2)")


def test_generated_referencing_generated_rejected_any_order():
    with pytest.raises(ValueError, match="references generated column"):
        parse("a FIELD, g2 FIELD AS (g1 * 2), g1 FIELD AS (a + 1)")


def test_generated_referencing_unknown_rejected():
    with pytest.raises(ValueError, match="unknown column 'nope'"):
        parse("a FIELD, g FIELD AS (a + nope)")


def test_duplicate_column_names_rejected():
    with pytest.raises(ValueError, match="duplicate column"):
        parse("a FIELD, a TAG")


def test_drop_if_exists_flag_captured():
    assert parse_statement("DROP TABLE IF EXISTS x").if_exists is True
    assert parse_statement("DROP TABLE x").if_exists is False


def test_vacuum_retain():
    stmt = parse_statement("VACUUM t1, t2 RETAIN 3600")
    assert stmt.kind == "vacuum" and stmt.tables == ["t1", "t2"]
    assert stmt.retain_seconds == 3600


def test_cluster_variants():
    t = parse_statement("TRUNCATE CLUSTER")
    assert t.kind == "truncate" and t.cluster and t.tables == []
    t2 = parse_statement("TRUNCATE CLUSTER a, b")
    assert t2.cluster and t2.tables == ["a", "b"]
    v = parse_statement("VACUUM CLUSTER RETAIN 60")
    assert v.kind == "vacuum" and v.cluster and v.retain_seconds == 60
    assert parse_statement("TRUNCATE").kind == "passthrough"  # no target


def test_vacuum_retention_cap():
    with pytest.raises(ValueError, match="cannot be more than"):
        parse_statement(f"VACUUM t RETAIN {2**63}")


def test_create_normal_table_statement():
    from modelardb_rs_spark.parser import parse_statement

    s = parse_statement("CREATE TABLE sensors(id BIGINT, name STRING, cal DOUBLE)")
    assert s.kind == "create_normal"
    assert s.tables == ["sensors"]
    assert "name STRING" in s.columns_ddl
    # Spark-specific variants are not claimed by the dialect
    assert parse_statement("CREATE TABLE t USING parquet AS SELECT 1").kind == "passthrough"
    assert parse_statement("CREATE TIME SERIES TABLE t(timestamp TIMESTAMP, f FIELD)").kind == "create_time_series"


def test_show_tables_and_describe(engine):
    engine.read_sql(
        "CREATE TIME SERIES TABLE d(timestamp TIMESTAMP, a FIELD, b FIELD(0.5), "
        "c FIELD(5.0%), g FIELD AS (a + b), t TAG)"
    )
    engine.create_table("n", "x INT, y STRING")
    shown = {(r["table_name"], r["table_type"]) for r in engine.read_sql("SHOW TABLES").collect()}
    assert shown == {("d", "time_series"), ("n", "normal")}
    desc = {r["column_name"]: (r["data_type"], r["role"]) for r in engine.read_sql("DESCRIBE d").collect()}
    assert desc["timestamp"] == ("timestamp", "timestamp")
    assert desc["a"] == ("float", "field(lossless)")
    assert desc["b"] == ("float", "field(0.5)")
    assert desc["c"] == ("float", "field(5%)")
    assert desc["g"][1].startswith("field as (")
    assert desc["t"] == ("string", "tag")
    descn = {r["column_name"]: r["data_type"] for r in engine.read_sql("DESC n").collect()}
    assert descn == {"x": "int", "y": "string"}


def test_time_travel_sql(engine, spark):
    """Delta-style VERSION AS OF / TIMESTAMP AS OF in SELECT."""
    import time as _time

    engine.read_sql(
        "CREATE TIME SERIES TABLE tt(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    engine.write(
        "tt",
        spark.range(100).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp",
            "CAST(id AS FLOAT) AS v", "'a' AS tag",
        ),
    )
    v1 = engine.folder.log("tt").snapshot().version
    _time.sleep(0.05)
    engine.write(
        "tt",
        spark.range(100, 150).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp",
            "CAST(id AS FLOAT) AS v", "'a' AS tag",
        ),
    )
    now = engine.read_sql("SELECT count(v) AS n FROM tt").collect()[0]["n"]
    assert now == 150
    old = engine.read_sql(
        f"SELECT count(v) AS n FROM tt VERSION AS OF {v1}"
    ).collect()[0]["n"]
    assert old == 100
    # both snapshots in one statement
    both = engine.read_sql(
        f"SELECT (SELECT count(*) FROM tt) - (SELECT count(*) FROM tt VERSION AS OF {v1}) AS delta"
    ).collect()[0]["delta"]
    assert both == 50


def test_explain_path(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE ep(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    engine.write(
        "ep",
        spark.range(200).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp",
            "CAST(id AS FLOAT) AS v", "'a' AS tag",
        ),
    )
    p1 = engine.explain_path("SELECT count(v) AS n FROM ep")
    assert p1.startswith("segment-stats pushdown (simple aggregates")
    p2 = engine.explain_path(
        "SELECT time_bucket('1 minute', timestamp) AS b, count(v) AS n "
        "FROM ep GROUP BY time_bucket('1 minute', timestamp)"
    )
    assert p2.startswith("segment-stats pushdown (bucketed resample")
    p3 = engine.explain_path(
        "SELECT count(v) AS n FROM ep WHERE timestamp >= timestamp '1970-01-01'"
    )
    assert p3.startswith("gridded view")
    assert engine.explain_path("SHOW TABLES") == "show_tables"


def test_explain_analyze_counters(engine, spark):
    """EXPLAIN ANALYZE on a mixed fast/slow table: the linear series
    decodes on the JVM fast path, the random series through the Python
    decode — both counters must be nonzero and sum to the table
    (reference metric parity: grid_exec.rs:439-518)."""
    import re as _re

    import numpy as np

    engine.read_sql(
        "CREATE TIME SERIES TABLE ea(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    rng = np.random.default_rng(5)
    lin = spark.range(300).selectExpr(
        "timestamp_micros(id * 1000000) AS timestamp",
        "CAST(id AS FLOAT) AS v", "'linear' AS tag",
    )
    rnd = spark.createDataFrame(
        [(i, float(rng.standard_normal())) for i in range(300)], "id long, x double"
    ).selectExpr(
        "timestamp_micros(id * 1000000) AS timestamp",
        "CAST(x AS FLOAT) AS v", "'random' AS tag",
    )
    engine.write("ea", lin.unionByName(rnd))

    out = engine.explain_path(
        "SELECT count(v) AS n FROM ea WHERE timestamp >= timestamp '1970-01-01'",
        analyze=True,
    )
    assert out.startswith("gridded view")
    nums = {
        k: int(v) for k, v in _re.findall(r"(\w+)=(\d+)", out.splitlines()[1])
    }
    assert nums["output_rows"] == 1
    assert nums["python_decoded_points"] > 0
    assert nums["jvm_fast_points"] > 0
    assert nums["python_decoded_points"] + nums["jvm_fast_points"] == 600
    assert nums["python_decoded_segments"] > 0
    assert nums["jvm_fast_segments"] > 0
    assert nums["python_arrow_batches"] >= 1
    # inline per-model-type breakdown (reference GridStream
    # rows_created_by_model_type, grid_exec.rs:439-451): the linear
    # series reconstructs from PMC-Mean/Swing models, the random series
    # from Gorilla — together they account for every point.
    model_line = next(
        line for line in out.splitlines() if line.startswith("rows_created_by_model_type:")
    )
    models = {k: int(v) for k, v in _re.findall(r"(\w+)=(\d+)", model_line)}
    assert models["gorilla"] > 0
    assert models["pmc_mean"] + models["swing"] > 0
    assert sum(models.values()) == 600
    # un-instrumented runs carry no counters
    assert engine._analyze_metrics is None


def test_delete_unsupported_shapes_are_refused(engine, spark):
    """Non-matching DELETE forms raise a clear error instead of falling
    through to spark.sql; DELETE on a normal table gets expire's
    friendly table-kind message; DATE literals are accepted."""
    engine.read_sql("CREATE TIME SERIES TABLE dl(timestamp TIMESTAMP, v FIELD)")
    engine.create_table("dn", "id BIGINT")
    with pytest.raises(ValueError, match="unsupported DELETE"):
        engine.read_sql("DELETE FROM dl WHERE dl.timestamp < TIMESTAMP '2024-01-01'")
    with pytest.raises(ValueError, match="unsupported DELETE"):
        engine.read_sql(
            "DELETE FROM dl WHERE timestamp < TIMESTAMP '2024-01-01' AND v > 3"
        )
    with pytest.raises(ValueError, match="time series tables only"):
        engine.read_sql("DELETE FROM dn WHERE ts < TIMESTAMP '2024-01-01'")
    engine.write(
        "dl",
        spark.range(10).selectExpr(
            "timestamp_micros(id * 86400000000) AS timestamp", "CAST(id AS FLOAT) AS v"
        ),
    )
    engine.read_sql("DELETE FROM dl WHERE timestamp < DATE '1970-01-05'")
    assert engine.table("dl").count() == 6


def test_explain_analyze_sql(engine, spark):
    """EXPLAIN ANALYZE over the SQL surface returns the instrumented
    report as rows (counters included)."""
    engine.read_sql("CREATE TIME SERIES TABLE exa(timestamp TIMESTAMP, v FIELD)")
    engine.write(
        "exa",
        spark.range(100).selectExpr(
            "timestamp_micros(id * 1000000) AS timestamp", "CAST(id AS FLOAT) AS v"
        ),
    )
    rows = engine.read_sql(
        "EXPLAIN ANALYZE SELECT count(v) AS n FROM exa "
        "WHERE timestamp >= timestamp '1970-01-01'"
    ).collect()
    text = "\n".join(r["plan"] for r in rows)
    assert "gridded view" in text and "output_rows=1" in text
    assert "python_decoded_points=" in text and "jvm_fast_" in text


def test_explain_analyze_counts_only_referenced_tables(engine, spark):
    """Counters must reflect the QUERIED table only — an unrelated
    catalog table contributes nothing (and no probe/agg jobs)."""
    import re as _re

    for t in ("eaa", "eab"):
        engine.read_sql(
            f"CREATE TIME SERIES TABLE {t}(timestamp TIMESTAMP, v FIELD, w FIELD)"
        )
        engine.write(
            t,
            spark.range(100).selectExpr(
                "timestamp_micros(id * 1000000) AS timestamp",
                "CAST(id AS FLOAT) AS v", "CAST(id * 2 AS FLOAT) AS w",
            ),
        )
    out = engine.explain_path(
        "SELECT count(v) AS n FROM eaa WHERE timestamp >= timestamp '1970-01-01'",
        analyze=True,
    )
    nums = {k: int(x) for k, x in _re.findall(r"(\w+)=(\d+)", out.splitlines()[1])}
    # both tables are all-JVM-decodable (linear); only eaa's 100 points
    # may be counted — eab's 100 must not appear
    assert nums["python_decoded_points"] + nums["jvm_fast_points"] == 100
