"""Segment-pushdown vs forced-grid aggregate equivalence — the
reference's critical correctness oracle (integration_test.rs:1129-1248):
for each of COUNT/MIN/MAX/SUM/AVG the model-rewritten path must match
the gridded path (exactly for COUNT/MIN/MAX, within f64 accumulation
noise for SUM/AVG), including under lossy bounds."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


@pytest.fixture()
def lossy_engine(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE m(timestamp TIMESTAMP, f FIELD(0.5), tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            f=float(i % 37) * 0.25 + (1.0 if i % 11 == 0 else 0.0),
            tag=f"t{i % 3}",
        )
        for i in range(3000)
    ]
    engine.write("m", spark.createDataFrame(rows))
    return engine


FORCED_GRID = " FROM m WHERE timestamp >= timestamp '1970-01-01'"


@pytest.mark.parametrize(
    "agg,exact",
    [("count", True), ("min", True), ("max", True), ("sum", False), ("avg", False)],
)
def test_pushdown_equals_grid(lossy_engine, agg, exact):
    push = lossy_engine.read_sql(f"SELECT {agg}(f) AS x FROM m").collect()[0].x
    grid = lossy_engine.read_sql(f"SELECT {agg}(f) AS x{FORCED_GRID}").collect()[0].x
    if exact:
        assert push == grid
    else:
        assert push == pytest.approx(grid, rel=1e-9)


def test_pushdown_grouped_by_tag(lossy_engine):
    push = {
        r.tag: (r.n, r.mn, r.mx)
        for r in lossy_engine.read_sql(
            "SELECT tag, count(f) AS n, min(f) AS mn, max(f) AS mx FROM m GROUP BY tag"
        ).collect()
    }
    grid = {
        r.tag: (r.n, r.mn, r.mx)
        for r in lossy_engine.read_sql(
            f"SELECT tag, count(f) AS n, min(f) AS mn, max(f) AS mx{FORCED_GRID} GROUP BY tag"
        ).collect()
    }
    assert push == grid


def test_pushdown_count_star(lossy_engine):
    push = lossy_engine.read_sql("SELECT count(*) AS n FROM m").collect()[0].n
    assert push == 3000


def test_pushdown_respects_error_bound(lossy_engine, spark):
    """Lossy SUM must stay within n_points * bound of the true sum."""
    true_sum = sum(
        float(i % 37) * 0.25 + (1.0 if i % 11 == 0 else 0.0) for i in range(3000)
    )
    push = lossy_engine.read_sql("SELECT sum(f) AS s FROM m").collect()[0].s
    assert abs(push - true_sum) <= 3000 * 0.5


def test_multiple_fields_in_one_select(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE mf(timestamp TIMESTAMP, a FIELD, b FIELD, tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            a=float(i),
            b=float(-i),
            tag="x",
        )
        for i in range(100)
    ]
    engine.write("mf", spark.createDataFrame(rows))
    out = engine.read_sql(
        "SELECT count(a) AS ca, sum(a) AS sa, min(b) AS mb, max(a) AS xa FROM mf"
    ).collect()[0]
    assert out.ca == 100
    assert out.sa == pytest.approx(sum(range(100)))
    assert out.mb == -99.0
    assert out.xa == 99.0


def test_tag_filter_pushdown_equals_grid(lossy_engine):
    push = lossy_engine.read_sql(
        "SELECT count(f) AS n, min(f) AS mn, max(f) AS mx FROM m WHERE tag = 't1'"
    ).collect()[0]
    grid = lossy_engine.read_sql(
        "SELECT count(f) AS n, min(f) AS mn, max(f) AS mx FROM m "
        "WHERE tag = 't1' AND timestamp >= timestamp '1970-01-01'"
    ).collect()[0]
    assert (push.n, push.mn, push.mx) == (grid.n, grid.mn, grid.mx)
    assert push.n == 1000
    # plan check: the tag-filtered rewrite must stay metadata-only
    plan = (
        lossy_engine.read_sql("SELECT count(f) AS n FROM m WHERE tag = 't1'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan


@pytest.mark.parametrize(
    "agg", ["count", "sum", "min", "max", "avg"]
)
def test_time_range_partial_pushdown_equals_grid(lossy_engine, agg):
    """Time-ranged aggregates answered from interior-segment stats plus
    decoded boundary segments must equal the fully gridded result."""
    start = TS0 + datetime.timedelta(seconds=317)
    end = TS0 + datetime.timedelta(seconds=2203)
    fast = lossy_engine.read_time_series_table(
        "m", columns={"f": agg}, start=start, end=end
    ).collect()[0][0]
    df = lossy_engine.table("m", start=start, end=end)
    import pyspark.sql.functions as SF

    slow = df.agg(getattr(SF, agg)("f")).collect()[0][0]
    if agg in ("count", "min", "max"):
        assert fast == slow
    else:
        assert fast == pytest.approx(slow, rel=1e-9)


def test_time_range_partial_pushdown_grouped(lossy_engine):
    start = TS0 + datetime.timedelta(seconds=100)
    end = TS0 + datetime.timedelta(seconds=2500)
    fast = {
        r.tag: r.count_f
        for r in lossy_engine.read_time_series_table(
            "m", columns={"f": "count"}, group_by=["tag"], start=start, end=end
        ).collect()
    }
    df = lossy_engine.table("m", start=start, end=end)
    slow = {r.tag: r.n for r in df.groupBy("tag").agg(F.count("f").alias("n")).collect()}
    assert fast == slow


def test_read_time_series_table_api(lossy_engine):
    out = lossy_engine.read_time_series_table(
        "m", columns={"f": "count"}, group_by=["tag"]
    ).collect()
    assert {r.tag: r.count_f for r in out} == {"t0": 1000, "t1": 1000, "t2": 1000}
    sliced = lossy_engine.read_time_series_table(
        "m",
        columns={"f": "count"},
        start=TS0,
        end=TS0 + datetime.timedelta(seconds=99),
    ).collect()[0]
    assert sliced.count_f == 100


@pytest.mark.parametrize("agg", ["var_pop", "var_samp", "stddev_pop", "stddev_samp", "variance", "stddev"])
def test_variance_pushdown_equals_grid(lossy_engine, agg):
    """Variance-family pushdown (seg_sum_sq accumulator — extension past
    the reference's rule) must match the gridded computation within f64
    noise, ungrouped and grouped, and under a time range."""
    push = lossy_engine.read_sql(f"SELECT {agg}(f) AS x FROM m").collect()[0].x
    grid = lossy_engine.read_sql(f"SELECT {agg}(f) AS x{FORCED_GRID}").collect()[0].x
    assert push == pytest.approx(grid, rel=1e-6, abs=1e-9)


def test_variance_pushdown_grouped_and_ranged(lossy_engine):
    push = {
        r.tag: r.v
        for r in lossy_engine.read_sql(
            "SELECT tag, var_pop(f) AS v FROM m GROUP BY tag"
        ).collect()
    }
    grid = {
        r.tag: r.v
        for r in lossy_engine.read_sql(
            f"SELECT tag, var_pop(f) AS v{FORCED_GRID} GROUP BY tag"
        ).collect()
    }
    assert push.keys() == grid.keys()
    for k in push:
        assert push[k] == pytest.approx(grid[k], rel=1e-6)
    # partial (time-range) pushdown path via the structured read API
    lo, hi = TS0 + datetime.timedelta(seconds=500), TS0 + datetime.timedelta(seconds=2500)
    ranged = lossy_engine.read_time_series_table(
        "m", columns={"f": "var_pop"}, start=lo, end=hi
    ).collect()[0][0]
    expect = lossy_engine.table("m").where(
        (F.col("timestamp") >= F.lit(lo)) & (F.col("timestamp") <= F.lit(hi))
    ).agg(F.var_pop("f")).collect()[0][0]
    assert ranged == pytest.approx(expect, rel=1e-6)


def test_variance_constant_series_is_zero(engine, spark):
    """A constant series has exactly zero variance: the closed-form
    sum-of-squares formula must clamp float residue, not go negative or
    NaN through sqrt."""
    engine.read_sql("CREATE TIME SERIES TABLE cz(timestamp TIMESTAMP, f FIELD)")
    rows = [Row(timestamp=TS0 + datetime.timedelta(seconds=i), f=1234.5) for i in range(500)]
    engine.write("cz", spark.createDataFrame(rows))
    r = engine.read_sql("SELECT var_pop(f) AS v, stddev_samp(f) AS s FROM cz").collect()[0]
    assert r.v == 0.0 and r.s == 0.0


def test_sql_two_sided_range_uses_partial_pushdown(lossy_engine):
    """A two-sided timestamp range in SQL routes to partial pushdown and
    must equal the gridded answer; a one-sided bound (the rewrite-defeat
    idiom) must keep decoding."""
    rng = (
        "timestamp >= timestamp '2024-01-01 00:10:00' "
        "AND timestamp <= timestamp '2024-01-01 00:40:00'"
    )
    push = lossy_engine.read_sql(
        f"SELECT count(f) AS n, sum(f) AS s, var_pop(f) AS v FROM m WHERE {rng}"
    ).collect()[0]
    grid = lossy_engine.read_sql(
        f"SELECT count(f) AS n, sum(f) AS s, var_pop(f) AS v FROM m WHERE {rng} "
        "AND timestamp >= timestamp '1970-01-01'"  # third bound defeats the rewrite
    ).collect()[0]
    assert push.n == grid.n and push.n > 0
    assert push.s == pytest.approx(grid.s, rel=1e-9)
    assert push.v == pytest.approx(grid.v, rel=1e-6)
    # the partial path reads stats: its plan has no full-table decode of
    # interior segments — boundary decode only (MapInPandas may appear)
    plan = lossy_engine.read_sql(
        f"SELECT count(f) AS n FROM m WHERE {rng}"
    )._jdf.queryExecution().executedPlan().toString()
    assert "value_count" in plan  # stats columns are in the scan
