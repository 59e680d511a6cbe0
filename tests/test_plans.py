"""Physical-plan shape assertions — the Spark analog of the reference's
TypeId-tree plan tests (model_simple_aggregates.rs:637-786): the
aggregate rewrite must produce a metadata-only scan (no Python decode
stage, narrow ReadSchema, pruned partitions), while the forced-grid path
must decode."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


@pytest.fixture()
def planned(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE p(timestamp TIMESTAMP, a FIELD, b FIELD, tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            a=float(i),
            b=float(i) * 2,
            tag="t",
        )
        for i in range(500)
    ]
    engine.write("p", spark.createDataFrame(rows))
    return engine


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pushdown_plan_has_no_python_stage(planned):
    plan = plan_of(planned.read_sql("SELECT count(a) AS c, sum(a) AS s FROM p"))
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    # narrow projection: only the stats columns are read
    assert "ReadSchema: struct<value_count:int,seg_sum:double>" in plan
    # partition pruning on the referenced field
    assert "field_column" in plan.split("PartitionFilters")[1][:80]


def test_forced_grid_plan_decodes(planned):
    plan = plan_of(
        planned.read_sql(
            "SELECT count(a) AS c FROM p WHERE timestamp >= timestamp '1970-01-01'"
        )
    )
    # the aggregate rewrite must NOT fire: the plan reconstructs points
    # (JVM explode fast path for this all-model table) instead of
    # aggregating stats columns
    assert "Generate explode" in plan or "MapInPandas" in plan
    assert "seg_sum" not in plan.split("ReadSchema")[-1]


def test_time_range_filters_reach_parquet(planned):
    df = planned.table("p", fields=["a"], start=TS0, end=TS0 + datetime.timedelta(seconds=10))
    plan = plan_of(df)
    pushed = plan.split("PushedFilters")[1][:200]
    # Spark elides long filter lists in toString ("GreaterThanOrEqual(
    # end_tim..."), so assert the interval rewrite's leading filters up
    # to wherever the truncation falls.
    assert "GreaterThanOrEqual(end_tim" in pushed
    assert "IsNotNull(start_time)" in pushed


def test_single_field_grid_has_no_shuffle(planned):
    """Univariate reads must stay map-only (no Exchange before decode)."""
    df = planned.table("p", fields=["a"])
    plan = plan_of(df)
    assert "Generate explode" in plan or "MapInPandas" in plan
    assert "Exchange" not in plan


def test_all_fast_grid_has_no_python_stage(planned):
    """The fixture's data is exactly linear with regular timestamps, so
    every segment is PMC/Swing + regular; the commit-log per-file stats
    prove it and the gridded read must not contain a Python stage at all
    (pure whole-stage-codegen explode reconstruction)."""
    df = planned.table("p", fields=["a", "b"])
    plan = plan_of(df)
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan


def test_multifield_grid_single_shuffle(planned):
    df = planned.table("p", fields=["a", "b"])
    plan = plan_of(df)
    # exactly one exchange: the keyed reassembly on (timestamp, tags)
    assert plan.count("Exchange") == 1


def test_sql_projection_prunes_reassembly(planned):
    """SQL referencing one of two stored fields must run the univariate
    plan: no collect_list reassembly, no Exchange except the final
    aggregate's (Catalyst can't prune fields through the zip aggregate,
    so the engine prunes them at view-registration time)."""
    df = planned.read_sql(
        "SELECT tag, count(a) AS n FROM p "
        "WHERE timestamp >= timestamp '1970-01-01' GROUP BY tag"
    )
    plan = plan_of(df)
    assert "arrays_zip" not in plan and "ObjectHashAggregate" not in plan
    assert plan.count("Exchange") <= 1  # only the final GROUP BY shuffle
    # both fields referenced -> the reassembly is back (either shape:
    # the codegen pivot when the snapshot proves unique points, or the
    # duplicate-preserving collect_list+arrays_zip otherwise)
    both = plan_of(
        planned.read_sql(
            "SELECT count(a + b) AS n FROM p "
            "WHERE timestamp >= timestamp '1970-01-01'"
        )
    )
    assert "arrays_zip" in both or "max(CASE WHEN" in both


def test_pii_plan_is_map_only(spark):
    """PII counting must stay inside whole-stage codegen: no Exchange,
    no Python stage — it runs at scan bandwidth at any scale."""
    from modelardb_rs_spark.operators.pii import pii_counts

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = plan_of(pii_counts(docs))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_quality_signals_plan_has_no_python(spark):
    from modelardb_rs_spark.operators.text import quality_features, unigram_lm_scores

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    assert "Python" not in plan_of(quality_features(docs))
    # the LM scorer shuffles (freq build + join) but never leaves the JVM
    assert "Python" not in plan_of(unigram_lm_scores(docs))


def test_line_dedup_plan_shuffles_only_on_keys(spark):
    """Line dedup is O(total lines): its exchanges are hash shuffles on
    the line/doc keys — no broadcast of corpus-sized data, no Python."""
    from modelardb_rs_spark.operators.lines import remove_common_lines

    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = plan_of(remove_common_lines(docs))
    assert "Python" not in plan


@pytest.fixture()
def pushdown_table(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE pt(timestamp TIMESTAMP, f1 FIELD, tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            f1=float(i),
            tag="a" if i % 2 == 0 else "b",
        )
        for i in range(300)
    ]
    engine.write("pt", spark.createDataFrame(rows))
    return engine


def test_sql_where_pushes_range_and_tags_into_view(pushdown_table):
    """A plain (non-aggregate) SELECT with an AND-only WHERE restricts
    the SEGMENT scan: timestamp bounds prune via the interval rewrite
    and tag equalities filter before decode."""
    engine = pushdown_table
    from pyspark.sql import functions as F

    sql = (
        "SELECT timestamp, f1 FROM pt "
        "WHERE timestamp >= TIMESTAMP '2024-01-01 00:02:00' AND tag = 'a' "
        "ORDER BY timestamp"
    )
    df = engine.read_sql(sql)
    plan = plan_of(df)
    # the segment-interval rewrite reached the scan subtree
    assert "end_time" in plan
    full = engine.table("pt", fields=["f1"])
    exp = (
        full.where((F.col("timestamp") >= "2024-01-01 00:02:00") & (F.col("tag") == "a"))
        .select("timestamp", "f1")
        .collect()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, exp))


def test_sql_where_pushdown_declines_unsafe_shapes(pushdown_table):
    """OR / BETWEEN / UNION / multiple WHEREs keep the FULL view —
    results must match the unrestricted semantics exactly."""
    engine = pushdown_table
    from pyspark.sql import functions as F

    full = engine.table("pt", fields=["f1"]).select("timestamp", "f1", "tag")

    q_or = engine.read_sql(
        "SELECT timestamp, f1 FROM pt "
        "WHERE timestamp >= TIMESTAMP '2024-01-01 00:03:00' OR tag = 'a'"
    )
    exp_or = full.where(
        (F.col("timestamp") >= "2024-01-01 00:03:00") | (F.col("tag") == "a")
    ).select("timestamp", "f1")
    assert sorted(map(tuple, q_or.collect())) == sorted(map(tuple, exp_or.collect()))

    q_union = engine.read_sql(
        "SELECT count(*) AS n FROM ("
        "SELECT timestamp FROM pt WHERE timestamp < TIMESTAMP '2024-01-01 00:02:00' "
        "UNION ALL "
        "SELECT timestamp FROM pt WHERE timestamp >= TIMESTAMP '2024-01-01 00:02:00') u"
    )
    assert q_union.collect()[0]["n"] == full.count()

    q_between = engine.read_sql(
        "SELECT count(*) AS n FROM pt WHERE timestamp BETWEEN "
        "TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-01 00:01:00' AND tag = 'a'"
    )
    exp_b = full.where(
        (F.col("timestamp") >= "2024-01-01 00:00:00")
        & (F.col("timestamp") <= "2024-01-01 00:01:00")
        & (F.col("tag") == "a")
    ).count()
    assert q_between.collect()[0]["n"] == exp_b


def test_bare_limit_prunes_segment_files(engine, spark):
    """`SELECT * FROM t LIMIT 10` must read O(limit) segment FILES, not
    the whole table: the commit-log point counts bound the scan with a
    time cutoff before Spark ever lists the data (reference pushes
    LIMIT into the scan, time_series_table.rs:447)."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE lt(timestamp TIMESTAMP, a FIELD, b FIELD, tag TAG)"
    )
    for c in range(12):  # 12 commits -> >= 12 files per field
        rows = [
            Row(
                timestamp=TS0 + datetime.timedelta(seconds=c * 1000 + i),
                a=float(i),
                b=float(i) * 3,
                tag="t",
            )
            for i in range(500)
        ]
        engine.write("lt", spark.createDataFrame(rows))
    engine.register_views()
    full = len(engine.spark.table("lt").inputFiles())
    assert full >= 12
    sql = "SELECT * FROM lt LIMIT 10"
    engine.register_views(for_sql=sql)
    pruned = len(engine.spark.table("lt").inputFiles())
    assert pruned <= max(2, full // 6), (pruned, full)
    out = engine.read_sql(sql)
    got = out.collect()
    assert len(got) == 10
    # every returned row is a genuine table row
    engine.register_views()
    full_rows = {
        (r["timestamp"], r["a"], r["b"], r["tag"])
        for r in engine.spark.table("lt").collect()
    }
    for r in got:
        assert (r["timestamp"], r["a"], r["b"], r["tag"]) in full_rows
    # larger-than-table LIMIT falls back to the full scan, full result
    out_all = engine.read_sql("SELECT * FROM lt LIMIT 1000000")
    assert out_all.count() == 6000


def test_bare_limit_declines_unsafe_shapes(engine):
    """Aggregates, WHERE, ORDER BY etc. must NOT trigger the limit
    cutoff — any-n-rows is only a correct answer for a bare row scan."""
    from modelardb_rs_spark.engine import _bare_limit

    assert _bare_limit("SELECT * FROM t LIMIT 10") == ("t", 10)
    assert _bare_limit("SELECT a, tag FROM t LIMIT 5") == ("t", 5)
    assert _bare_limit("SELECT count(*) FROM t LIMIT 10") is None
    assert _bare_limit("SELECT * FROM t WHERE a > 1 LIMIT 10") is None
    assert _bare_limit("SELECT * FROM t ORDER BY a LIMIT 10") is None
    assert _bare_limit("SELECT DISTINCT a FROM t LIMIT 10") is None
    assert _bare_limit("SELECT * FROM t LIMIT 10 OFFSET 5") is None
    assert _bare_limit("SELECT a FROM t JOIN u ON x = y LIMIT 3") is None
    assert _bare_limit("SELECT max(a) OVER () FROM t LIMIT 2") is None


def test_value_predicate_prunes_segments(planned):
    """`WHERE a > x` must prune segments by max_value BEFORE decode —
    the filter appears against the segment stats columns in the plan —
    and results must stay exact (post-decode re-filter unchanged)."""
    df = planned.read_sql("SELECT a FROM p WHERE a >= 450")
    plan = plan_of(df)
    assert "max_value" in plan  # stat pruning reached the segment scan
    assert df.count() == 50  # a = 0..499: exactly 450..499 qualify
    # the dual side: a < x prunes by min_value
    df2 = planned.read_sql("SELECT a FROM p WHERE a < 50")
    assert "min_value" in plan_of(df2)
    assert df2.count() == 50
    # a statement shape the conservative WHERE extractor declines (an
    # OR) must not prune — and must still answer exactly
    df3 = planned.read_sql("SELECT a FROM p WHERE a >= 450 OR a < 10")
    assert "max_value" not in plan_of(df3)
    assert df3.count() == 60


def test_value_predicate_declines_on_duplicates(engine, spark):
    """With duplicate (timestamp, series) points the multifield zip
    pairing would shift if one duplicate's segment were pruned — the
    pushdown must decline and results must match the unpruned answer."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE dupv(timestamp TIMESTAMP, a FIELD, b FIELD, tag TAG)"
    )
    rows = [
        Row(timestamp=TS0, a=1.0, b=5.0, tag="t"),
        Row(timestamp=TS0, a=9.0, b=7.0, tag="t"),  # duplicate ts
        Row(timestamp=TS0 + datetime.timedelta(seconds=1), a=2.0, b=1.0, tag="t"),
    ]
    # two writes so the duplicates land in overlapping segments
    engine.write("dupv", spark.createDataFrame([rows[0], rows[2]]))
    engine.write("dupv", spark.createDataFrame([rows[1]]))
    out = engine.read_sql(
        "SELECT a, b FROM dupv WHERE a > 8 AND timestamp >= timestamp '1970-01-01'"
    ).collect()
    assert len(out) == 1 and out[0]["a"] == 9.0
    # the pairing of (9.0, b) must equal the unpruned view's pairing
    full = engine.table("dupv").where(F.col("a") > 8).collect()
    assert {(r["a"], r["b"]) for r in out} == {(r["a"], r["b"]) for r in full}


def test_ann_rank_is_two_phase(spark):
    """The ANN paths' shared top-k rank (similarity.ranked_topk) must
    plan as Spark's two-phase rank limit: a PARTIAL WindowGroupLimit
    before the exchange (each input partition forwards only its k best
    rows per query — the exchange never carries the corpus-sized
    scored set) and the FINAL limit + window after it. Pinning the
    shape catches regressions like an ordering expression the
    optimizer declines or k above windowGroupLimitThreshold."""
    from modelardb_rs_spark.operators import similarity
    from modelardb_rs_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    out = similarity.brute_force_topk(emb, queries, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial = plan.index("row_number(), 5, Partial")
    final = plan.index("row_number(), 5, Final")
    exchange = plan.index("Exchange hashpartitioning(query_id")
    # executedPlan prints top-down: Final < Exchange < Partial
    assert final < exchange < partial, plan
    assert out.count() == 4 * 5


def test_asof_hot_key_window_partitions_by_time_bucket(spark):
    """The two-pass as-of plan's SCALE property is that the carried-
    value window partitions by (key, time bucket) — one hot key spreads
    over N tasks instead of one. Pin that in the physical plan: the
    Window operator's partition spec must include the bucket column
    (and the one-pass plan's must not)."""
    from modelardb_rs_spark.operators.asof import asof_join

    left = spark.range(200).selectExpr("CAST(0 AS INT) AS k", "id AS t", "id AS lv")
    right = spark.range(50).selectExpr(
        "CAST(0 AS INT) AS k", "id * 4 AS t", "id + 1000 AS rv"
    )
    two = asof_join(
        left, right, on="t", by=["k"], right_value_cols=["rv"], hot_key_buckets=8
    )
    plan2 = two._jdf.queryExecution().executedPlan().toString()
    win2 = [ln for ln in plan2.splitlines() if "Window" in ln and "windowspec" in ln.lower()]
    assert win2 and all("__b__" in ln for ln in win2), plan2[:2000]

    one = asof_join(left, right, on="t", by=["k"], right_value_cols=["rv"])
    plan1 = one._jdf.queryExecution().executedPlan().toString()
    win1 = [ln for ln in plan1.splitlines() if "Window" in ln and "windowspec" in ln.lower()]
    assert win1 and not any("__b__" in ln for ln in win1)
