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


@pytest.fixture(scope="module")
def lossy_engine(spark, tmp_path_factory):
    # module-scoped: every consumer is read-only on table m, so the
    # 3000-point ingest is paid once instead of once per (parametrized)
    # test — the suite must stay inside the driver's pytest budget
    from modelardb_rs_spark.engine import Engine

    engine = Engine(spark, str(tmp_path_factory.mktemp("lossy") / "data_folder"))
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


# --------------------------------------------------------------- resample


@pytest.fixture(scope="module")
def resample_engine(spark, tmp_path_factory):
    """Mixed table: a piecewise-constant regular series (-> PMC closed
    form) and a noisy series (-> Gorilla decode path). Module-scoped:
    consumers are read-only on table r."""
    import numpy as np
    import pandas as pd

    from modelardb_rs_spark.engine import Engine

    engine = Engine(spark, str(tmp_path_factory.mktemp("resample") / "data_folder"))
    engine.read_sql(
        "CREATE TIME SERIES TABLE r(timestamp TIMESTAMP, value FIELD(1.0), sensor TAG)"
    )
    n = 4000
    ts = pd.to_datetime(
        np.arange(n) * 10_000_000 + 1_700_000_000_000_000, unit="us", utc=True
    ).tz_localize(None)
    const_vals = np.repeat(np.arange(n // 400) * 2.0, 400).astype(np.float32)
    rng = np.random.default_rng(11)
    noisy_vals = (np.sin(np.arange(n) / 3) * 50 + rng.normal(0, 30, n)).astype(
        np.float32
    )
    pdf = pd.concat(
        [
            pd.DataFrame({"timestamp": ts, "value": const_vals, "sensor": "c"}),
            pd.DataFrame({"timestamp": ts, "value": noisy_vals, "sensor": "n"}),
        ]
    )
    engine.write("r", spark.createDataFrame(pdf))
    return engine


def _ref_resample(engine, every_sql: str):
    pts = engine.table("r")
    return {
        (r.bucket, r.sensor): (r.c, r.s, r.a, r.mn, r.mx, r.sp)
        for r in pts.groupBy(
            F.date_trunc(every_sql, "timestamp").alias("bucket"), "sensor"
        )
        .agg(
            F.count("*").alias("c"),
            F.sum("value").alias("s"),
            F.avg("value").alias("a"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.stddev_pop("value").alias("sp"),
        )
        .collect()
    }


def test_resample_equals_gridded_groupby(resample_engine):
    """Closed-form PMC buckets + decoded Gorilla buckets must equal the
    decode-everything GROUP BY time bucket, per aggregate."""
    got = {
        (r.bucket, r.sensor): (
            r.count_value,
            r.sum_value,
            r.avg_value,
            r.min_value,
            r.max_value,
            r.stddev_pop_value,
        )
        for r in resample_engine.resample(
            "r",
            "1 hour",
            {"value": "count"},
            group_by=["sensor"],
        )
        .join(
            resample_engine.resample("r", "1 hour", {"value": "sum"}, group_by=["sensor"]),
            ["bucket", "sensor"],
        )
        .join(
            resample_engine.resample("r", "1 hour", {"value": "avg"}, group_by=["sensor"]),
            ["bucket", "sensor"],
        )
        .join(
            resample_engine.resample("r", "1 hour", {"value": "min"}, group_by=["sensor"]),
            ["bucket", "sensor"],
        )
        .join(
            resample_engine.resample("r", "1 hour", {"value": "max"}, group_by=["sensor"]),
            ["bucket", "sensor"],
        )
        .join(
            resample_engine.resample(
                "r", "1 hour", {"value": "stddev_pop"}, group_by=["sensor"]
            ),
            ["bucket", "sensor"],
        )
        .collect()
    }
    ref = _ref_resample(resample_engine, "hour")
    assert set(got) == set(ref) and len(ref) > 5
    for k, (c, s, a, mn, mx, sp) in got.items():
        rc, rs, ra, rmn, rmx, rsp = ref[k]
        assert c == rc and mn == rmn and mx == rmx
        assert s == pytest.approx(rs, rel=1e-9)
        assert a == pytest.approx(ra, rel=1e-9)
        assert sp == pytest.approx(rsp, abs=1e-6)


def test_resample_time_range_clips_buckets(resample_engine):
    got = {
        (r.bucket, r.sensor): r.count_value
        for r in resample_engine.resample(
            "r",
            "30 minutes",
            {"value": "count"},
            group_by=["sensor"],
            start="2023-11-14T23:00:00",
            end="2023-11-15T03:10:00",
        ).collect()
    }
    pts = resample_engine.table(
        "r", start="2023-11-14T23:00:00", end="2023-11-15T03:10:00"
    )
    ref = {
        (r.bucket, r.sensor): r.c
        for r in pts.groupBy(
            F.window("timestamp", "30 minutes").start.alias("bucket"), "sensor"
        )
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == ref and len(ref) > 0


def test_resample_pmc_only_plan_is_jvm_only(engine, spark):
    """An all-PMC regular table resamples with NO Python stage and NO
    binary payload columns in the scan: the commit log proves all-fast,
    the closed form reads only metadata columns."""
    import numpy as np
    import pandas as pd

    engine.read_sql(
        "CREATE TIME SERIES TABLE p(timestamp TIMESTAMP, value FIELD(1.0))"
    )
    n = 2000
    ts = pd.to_datetime(
        np.arange(n) * 60_000_000 + 1_700_000_000_000_000, unit="us", utc=True
    ).tz_localize(None)
    vals = np.repeat(np.arange(n // 500) * 3.0, 500).astype(np.float32)
    engine.write("p", spark.createDataFrame(pd.DataFrame({"timestamp": ts, "value": vals})))
    df = engine.resample("p", "1 hour", {"value": "sum"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan
    # column pruning: the binary payloads are not read
    assert "timestamps" not in plan and "residuals" not in plan
    # and the result matches the decoded reference
    ref = {
        r.bucket: r.s
        for r in engine.table("p")
        .groupBy(F.date_trunc("hour", "timestamp").alias("bucket"))
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    got = {r.bucket: r.sum_value for r in df.collect()}
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)


def test_resample_single_point_and_duplicate_ts_segments(engine, spark):
    """n==1 segments and irregular/duplicate-timestamp rows take the
    decode path and still bucket correctly."""
    rows = [
        Row(timestamp=TS0, value=5.0, s="a"),
        Row(timestamp=TS0 + datetime.timedelta(seconds=10), value=7.0, s="b"),
        Row(timestamp=TS0 + datetime.timedelta(minutes=90), value=9.0, s="b"),
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE one(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("one", spark.createDataFrame(rows))
    got = {
        (r.bucket.isoformat(), r.s): (r.count_value, r.sum_value)
        for r in engine.resample("one", "1 hour", {"value": "count"}, group_by=["s"])
        .join(
            engine.resample("one", "1 hour", {"value": "sum"}, group_by=["s"]),
            ["bucket", "s"],
        )
        .collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", "a"): (1, 5.0),
        ("2024-01-01T00:00:00", "b"): (1, 7.0),
        ("2024-01-01T01:00:00", "b"): (1, 9.0),
    }


# --------------------------------------------------------------- gapfill


def test_gapfill_linear_and_locf(engine, spark):
    """Hand-computed fills: observed buckets 0h(2.0) 1h(4.0) 4h(10.0)
    per sensor -> linear fills 2h=6, 3h=8; locf fills both with 4."""
    rows = [
        Row(timestamp=TS0, value=2.0, s="x"),
        Row(timestamp=TS0 + datetime.timedelta(hours=1), value=4.0, s="x"),
        Row(timestamp=TS0 + datetime.timedelta(hours=4), value=10.0, s="x"),
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE gf(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("gf", spark.createDataFrame(rows))
    lin = {
        r.bucket.hour: (r.value, r.was_gap)
        for r in engine.gapfill("gf", "1 hour", "value", method="linear").collect()
    }
    assert lin == {
        0: (2.0, False),
        1: (4.0, False),
        2: (6.0, True),
        3: (8.0, True),
        4: (10.0, False),
    }
    locf = {
        r.bucket.hour: r.value
        for r in engine.gapfill("gf", "1 hour", "value", method="locf").collect()
    }
    assert locf[2] == 4.0 and locf[3] == 4.0 and locf[4] == 10.0


def test_gapfill_leading_gap_stays_null(engine, spark):
    """Two sensors with different spans; strict linear leaves no
    extrapolation (all spine buckets bounded by observations), and a
    sensor with one observation yields a single bucket."""
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(hours=2), value=1.0, s="a"),
        Row(timestamp=TS0 + datetime.timedelta(hours=5), value=7.0, s="a"),
        Row(timestamp=TS0, value=3.0, s="b"),
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE gf2(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("gf2", spark.createDataFrame(rows))
    out = engine.gapfill("gf2", "1 hour", "value", method="linear").collect()
    by = {(r.s, r.bucket.hour): r.value for r in out}
    assert by[("a", 2)] == 1.0 and by[("a", 5)] == 7.0
    assert by[("a", 3)] == pytest.approx(3.0) and by[("a", 4)] == pytest.approx(5.0)
    assert by[("b", 0)] == 3.0 and len([k for k in by if k[0] == "b"]) == 1


def test_resample_swing_count_min_max_closed_form(engine, spark):
    """A clean linear ramp compresses to Swing segments; count/min/max
    resample stays JVM-only (closed form at endpoint indices) and equals
    the gridded reference; a sum resample must still decode (Python
    stage present) and also match."""
    import numpy as np
    import pandas as pd

    engine.read_sql(
        "CREATE TIME SERIES TABLE sw(timestamp TIMESTAMP, value FIELD(0.5))"
    )
    n = 3000
    ts = pd.to_datetime(
        np.arange(n) * 30_000_000 + 1_700_000_000_000_000, unit="us", utc=True
    ).tz_localize(None)
    vals = (np.arange(n) * 0.25).astype(np.float32)  # exact ramp
    engine.write("sw", spark.createDataFrame(pd.DataFrame({"timestamp": ts, "value": vals})))
    segs = engine.segments("sw")
    from modelardb_rs_spark.types import SWING_ID

    kinds = {r.model_type_id for r in segs.select("model_type_id").distinct().collect()}
    assert kinds == {SWING_ID}

    df = (
        engine.resample("sw", "1 hour", {"value": "count"})
        .join(engine.resample("sw", "1 hour", {"value": "min"}), "bucket")
        .join(engine.resample("sw", "1 hour", {"value": "max"}), "bucket")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan
    ref = {
        r.bucket: (r.c, r.mn, r.mx)
        for r in engine.table("sw")
        .groupBy(F.date_trunc("hour", "timestamp").alias("bucket"))
        .agg(F.count("*").alias("c"), F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    got = {r.bucket: (r.count_value, r.min_value, r.max_value) for r in df.collect()}
    assert got == ref and len(ref) > 10

    # the closed form is in the plan: per-bucket explode over segment
    # bounds (the pmod bucket arithmetic), alongside the (empty) fallback
    assert "pmod(start_time" in plan
    # sum routes Swing rows to per-point reconstruction (here the JVM
    # grid fast path — regular Swing still needs no Python). Branch
    # PRESENCE can't distinguish (both branches always exist, row-
    # filtered), so correctness below is the check; the Swing filter in
    # the fast branch must mention param1 only under the count/min/max
    # form — assert the sum plan's fast filter excludes Swing:
    sm = engine.resample("sw", "1 hour", {"value": "sum"})
    sm_plan = sm._jdf.queryExecution().executedPlan().toString()
    assert "sequence(0" in sm_plan  # per-point reconstruction branch live
    ref_s = {
        r.bucket: r.s
        for r in engine.table("sw")
        .groupBy(F.date_trunc("hour", "timestamp").alias("bucket"))
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    for r in sm.collect():
        assert r.sum_value == pytest.approx(ref_s[r.bucket], rel=1e-9)


def test_sql_time_bucket_routes_to_resample(lossy_engine):
    """GROUP BY time_bucket / date_trunc in SQL routes through the
    resample rewrite and equals the gridded group-by; tag group keys and
    two-sided ranges compose."""
    push = lossy_engine.read_sql(
        "SELECT time_bucket('10 minutes', timestamp) AS b, tag, "
        "count(f) AS n, sum(f) AS sm FROM m "
        "GROUP BY time_bucket('10 minutes', timestamp), tag"
    )
    ref = lossy_engine.read_sql(
        "SELECT date_trunc('minute', timestamp) AS mnt, tag, f FROM m "
        "WHERE timestamp >= timestamp '1970-01-01'"
    )
    from pyspark.sql import functions as FF

    ref = (
        ref.withColumn(
            "b", FF.timestamp_micros((FF.unix_micros("mnt") / 600000000).cast("long") * 600000000)
        )
        .groupBy("b", "tag")
        .agg(FF.count("f").alias("rn"), FF.sum("f").alias("rsm"))
    )
    j = push.join(ref, ["b", "tag"], "full_outer")
    bad = j.where(
        FF.col("n").isNull() | FF.col("rn").isNull() | (FF.col("n") != FF.col("rn"))
        | (FF.abs(FF.col("sm") - FF.col("rsm")) > 1e-6)
    ).count()
    assert bad == 0 and push.count() > 3


def test_resample_pre_epoch_timestamps(engine, spark):
    """Negative-µs (pre-1970) timestamps bucket correctly on both the
    closed-form and gridded paths (pmod-based floor division, not
    truncation toward zero)."""
    import datetime as dt

    t0 = dt.datetime(1969, 12, 31, 22, 30, tzinfo=dt.timezone.utc)
    rows = [
        Row(timestamp=t0 + dt.timedelta(minutes=10 * i), value=5.0, s="c")
        for i in range(12)  # constant -> PMC, spans the epoch boundary
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE pe(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("pe", spark.createDataFrame(rows))
    got = {
        r.bucket.isoformat(): r.count_value
        for r in engine.resample("pe", "1 hour", {"value": "count"}).collect()
    }
    assert got == {
        "1969-12-31T22:00:00": 3,
        "1969-12-31T23:00:00": 6,
        "1970-01-01T00:00:00": 3,
    }


def test_sql_max_by_min_by_edge_rewrite(lossy_engine):
    """max_by/min_by(field, timestamp) — the last()/first() idiom —
    routes to the edge-points read and equals the gridded answer,
    grouped and with tag filters; mixing with simple aggregates falls
    back to the gridded path and still answers."""
    push = {
        r.tag: (r.lv, r.fv)
        for r in lossy_engine.read_sql(
            "SELECT tag, max_by(f, timestamp) AS lv, min_by(f, timestamp) AS fv "
            "FROM m GROUP BY tag"
        ).collect()
    }
    grid = {
        r.tag: (r.lv, r.fv)
        for r in lossy_engine.read_sql(
            "SELECT tag, max_by(f, timestamp) AS lv, min_by(f, timestamp) AS fv "
            f"{FORCED_GRID} GROUP BY tag"
        ).collect()
    }
    assert push == grid and len(push) == 3
    mixed = lossy_engine.read_sql(
        "SELECT count(f) AS n, max_by(f, timestamp) AS lv FROM m"
    ).collect()[0]
    grid_last = lossy_engine.read_sql(
        f"SELECT max_by(f, timestamp) AS lv{FORCED_GRID}"
    ).collect()[0].lv
    assert mixed.n == 3000 and mixed.lv == grid_last


def test_value_at_interpolation_and_locf(engine, spark):
    """Point-in-time lookup: observed points at 0h(2.0) and 4h(10.0);
    value_at 1h interpolates 4.0 linearly, carries 2.0 forward for locf,
    and is NULL before the first observation under linear."""
    rows = [
        Row(timestamp=TS0, value=2.0, s="x"),
        Row(timestamp=TS0 + datetime.timedelta(hours=4), value=10.0, s="x"),
        Row(timestamp=TS0 + datetime.timedelta(hours=2), value=7.0, s="y"),
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE va(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("va", spark.createDataFrame(rows))
    at = TS0 + datetime.timedelta(hours=1)
    lin = {r.s: r.value for r in engine.value_at("va", at).collect()}
    assert lin["x"] == pytest.approx(4.0)
    assert lin["y"] is None  # before y's first point: strict linear
    locf = {r.s: r.value for r in engine.value_at("va", at, method="locf").collect()}
    assert locf["x"] == pytest.approx(2.0) and locf["y"] is None
    # exact hit returns the stored value
    exact = {r.s: r.value for r in engine.value_at("va", TS0 + datetime.timedelta(hours=2)).collect()}
    assert exact["y"] == pytest.approx(7.0)


def test_m4_downsample(engine, spark):
    """M4 keeps exactly first/last/min/max per bucket; a monotone bucket
    emits 2 distinct points (first==min, last==max)."""
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(minutes=i), value=v, s="x")
        for i, v in enumerate([5.0, 1.0, 9.0, 4.0])  # one 1-hour bucket
    ] + [
        Row(timestamp=TS0 + datetime.timedelta(hours=1, minutes=i), value=float(i), s="x")
        for i in range(4)  # monotone second bucket
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE m4t(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("m4t", spark.createDataFrame(rows))
    out = engine.m4("m4t", "1 hour", "value").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket.hour, set()).add((r.timestamp.minute, r.value))
    assert by_bucket[0] == {(0, 5.0), (1, 1.0), (2, 9.0), (3, 4.0)}
    assert by_bucket[1] == {(0, 0.0), (3, 3.0)}


def test_sql_time_bucket_week_and_fallback(lossy_engine):
    """Weekly buckets are Monday-aligned (TimescaleDB origin semantics),
    and statements the rewrite declines (extra ORDER BY) still run:
    time_bucket is inlined as epoch arithmetic for plain spark.sql."""
    push = lossy_engine.read_sql(
        "SELECT time_bucket('1 week', timestamp) AS b, count(f) AS n "
        "FROM m GROUP BY time_bucket('1 week', timestamp)"
    )
    rows = push.collect()
    assert rows and all(r.b.weekday() == 0 for r in rows)  # Monday
    fb = lossy_engine.read_sql(
        "SELECT time_bucket('1 week', timestamp) AS b, count(f) AS n "
        "FROM m GROUP BY time_bucket('1 week', timestamp) ORDER BY b"
    )
    assert sorted((r.b, r.n) for r in rows) == [(r.b, r.n) for r in fb.collect()]


def test_sql_date_trunc_declines_outside_utc(lossy_engine):
    """date_trunc truncates in the session zone; the epoch-aligned
    rewrite only fires under UTC — elsewhere the statement falls back to
    spark.sql and still answers with zone semantics."""
    spark = lossy_engine.spark
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = lossy_engine.read_sql(
            "SELECT date_trunc('day', timestamp) AS b, count(f) AS n "
            "FROM m GROUP BY date_trunc('day', timestamp)"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "pmod(start_time" not in plan  # rewrite declined
        assert df.count() >= 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_zscore_outliers_segment_skipping(engine, spark):
    """Planted spikes in a smooth series are found, match the gridded
    z-score filter, and a clean (spike-free) tag contributes nothing."""
    import numpy as np
    import pandas as pd

    engine.read_sql(
        "CREATE TIME SERIES TABLE oz(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    n = 3000
    rng = np.random.default_rng(5)
    ts = pd.to_datetime(
        np.arange(n) * 1_000_000 + 1_700_000_000_000_000, unit="us", utc=True
    ).tz_localize(None)
    spiky = rng.normal(0, 1, n).astype(np.float32)
    spiky[[50, 1500]] = [25.0, -25.0]
    clean = rng.normal(5, 1, n).astype(np.float32)
    pdf = pd.concat(
        [
            pd.DataFrame({"timestamp": ts, "value": spiky, "s": "spiky"}),
            pd.DataFrame({"timestamp": ts, "value": clean, "s": "clean"}),
        ]
    )
    engine.write("oz", spark.createDataFrame(pdf))
    got = engine.outliers("oz", z=6.0).collect()
    assert {(r.s, round(r.value)) for r in got} == {("spiky", 25), ("spiky", -25)}
    assert all(abs(r.zscore) > 6.0 for r in got)
    # exactness vs the gridded computation per series
    pts = engine.table("oz")
    for s in ("spiky", "clean"):
        sub = pts.where(F.col("s") == s)
        st = sub.agg(F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")).collect()[0]
        ref = sub.where(F.abs(F.col("value") - st.mu) > 6.0 * st.sd).count()
        assert ref == len([r for r in got if r.s == s])


def test_value_histogram_bins_and_clamping(engine, spark):
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), value=v, s="x")
        for i, v in enumerate([-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 25.0])
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE hg(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("hg", spark.createDataFrame(rows))
    out = {
        (r.bin): (r.bin_lo, r.n)
        for r in engine.histogram("hg", "value", lo=0.0, hi=10.0, nbins=2).collect()
    }
    # bin 0 = [0,5): {-5 clamped, 0, 4.9}; bin 1 = [5,10) + >=10 clamped
    assert out == {0: (0.0, 3), 1: (5.0, 4)}


def test_deltas_and_rolling_mean(engine, spark):
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=10 * i), value=float(i * i), s="x")
        for i in range(5)
    ]
    engine.read_sql(
        "CREATE TIME SERIES TABLE dr(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("dr", spark.createDataFrame(rows))
    d = {r.value: (r.delta, r.dt_s, r.rate) for r in engine.deltas("dr", "value").collect()}
    assert d[0.0] == (None, None, None)
    assert d[4.0] == (3.0, 10.0, 0.3)  # 4-1 over 10s
    assert d[16.0] == (7.0, 10.0, 0.7)
    rm = {r.value: r.rolling_mean for r in engine.rolling_mean("dr", "value", n=3).collect()}
    assert rm[0.0] == 0.0 and rm[1.0] == 0.5
    assert rm[16.0] == pytest.approx((4 + 9 + 16) / 3)


def test_cusum_changepoint(engine, spark):
    """A planted mean shift must be found at the exact split point with
    the two segment means; a constant series peaks nowhere meaningful
    but still returns one interior argmax (earliest tie); a 1-point
    series is dropped (no interior split). Plan: all three windows
    reuse ONE exchange keyed by series."""
    rows = []
    for i in range(10):  # series "a": mean 1.0 then mean 5.0 after i=5
        rows.append(Row(
            timestamp=TS0 + datetime.timedelta(seconds=10 * i),
            value=1.0 if i < 6 else 5.0, s="a",
        ))
    for i in range(4):  # series "b": constant
        rows.append(Row(
            timestamp=TS0 + datetime.timedelta(seconds=10 * i), value=2.0, s="b",
        ))
    rows.append(Row(timestamp=TS0, value=9.0, s="c"))  # singleton
    engine.read_sql(
        "CREATE TIME SERIES TABLE cps(timestamp TIMESTAMP, value FIELD, s TAG)"
    )
    engine.write("cps", spark.createDataFrame(rows))
    out = {r["s"]: r for r in engine.changepoints("cps", "value").collect()}
    assert set(out) == {"a", "b"}  # singleton dropped
    a = out["a"]
    assert a["n_points"] == 10
    # collected timestamps come back session-local-naive: compare on
    # the UTC epoch instead of datetime identity
    cp_utc = a["cp_timestamp"].replace(tzinfo=datetime.timezone.utc)
    assert cp_utc == TS0 + datetime.timedelta(seconds=50)  # i=5
    assert a["mean_before"] == 1.0 and a["mean_after"] == 5.0
    assert a["shift"] == 4.0
    # D at the true split: |6*1 - (6/10)*26| = 9.6
    assert a["d_stat"] == pytest.approx(9.6)
    b = out["b"]
    assert b["d_stat"] == 0.0 and b["shift"] == 0.0
    assert b["cp_timestamp"].replace(tzinfo=datetime.timezone.utc) == TS0  # earliest tie
    # one exchange: every window reuses the per-series partitioning
    plan = engine.changepoints("cps", "value")._jdf.queryExecution(
    ).executedPlan().toString()
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_cusum_changepoint_ignores_null_values(spark):
    """NULL values must not count toward n or the segment means — a
    NULL row is no observation, and the per-row ROWS frame keeps S_i
    aligned with i around it."""
    from modelardb_rs_spark.operators.series import cusum_changepoint

    rows = [("a", 0, 1.0), ("a", 1, None), ("a", 2, 1.0),
            ("a", 3, 5.0), ("a", 4, 5.0)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    r = cusum_changepoint(df, ["k"], "t", "y").collect()[0]
    assert r["n_points"] == 4          # the NULL row is not a point
    assert r["cp_t"] == 2              # split after the second real 1.0
    assert r["mean_before"] == 1.0 and r["mean_after"] == 5.0
    # an all-NULL series yields nothing rather than a divide-by-zero
    df2 = spark.createDataFrame([("b", 0, None), ("b", 1, None)],
                                "k string, t int, y double")
    assert cusum_changepoint(df2, ["k"], "t", "y").count() == 0


def test_cusum_changepoint_fuzz_vs_numpy(spark):
    """60 seeded random series (varying lengths, planted and unplanted
    shifts, ties) in ONE frame must each match a numpy replay of the
    CUSUM rule bit-for-bat on split index, statistic, and means."""
    import numpy as np

    from modelardb_rs_spark.operators.series import cusum_changepoint

    rng = np.random.default_rng(42)
    rows, series = [], {}
    for s in range(60):
        n = int(rng.integers(2, 40))
        y = rng.normal(size=n)
        if s % 3 == 0:  # planted shift
            cp = int(rng.integers(1, n))
            y[cp:] += rng.uniform(1, 5)
        if s % 7 == 0:  # constant series: all-tie D
            y = np.full(n, float(rng.integers(-3, 3)))
        y = np.round(y, 6)
        series[f"s{s}"] = y
        rows += [(f"s{s}", i, float(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    got = {r["k"]: r for r in cusum_changepoint(df, ["k"], "t", "y").collect()}
    assert set(got) == set(series)
    for k, y in series.items():
        n = len(y)
        S = np.cumsum(y)
        D = np.abs(S[:-1] - (np.arange(1, n) / n) * S[-1])
        i = int(np.argmax(D))  # earliest tie, matching the operator
        r = got[k]
        assert r["cp_t"] == i, k
        # floats compare to half an ulp of the 6-decimal rounding:
        # Spark rounds HALF_UP, python round() half-even — exact
        # equality flips on .5 boundaries (hit at seed 42, series s4)
        assert abs(r["d_stat"] - float(D[i])) <= 6e-7, k
        assert abs(r["mean_before"] - float(S[i] / (i + 1))) <= 6e-7, k
        assert abs(r["mean_after"] - float((S[-1] - S[i]) / (n - i - 1))) <= 6e-7, k


def test_resample_randomized_mixed_series(engine, spark):
    """Seeded random mix of plateaus (PMC), ramps (Swing), and noise
    (Gorilla) resampled at odd widths must equal the decode-everything
    group-by for every aggregate — the property-style check on the
    closed-form index math."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    engine.read_sql(
        "CREATE TIME SERIES TABLE rz(timestamp TIMESTAMP, value FIELD(0.5), s TAG)"
    )
    frames = []
    for si in range(3):
        n = 1500
        step_us = int(rng.choice([5, 17, 60])) * 1_000_000
        ts = pd.to_datetime(
            np.arange(n) * step_us + 1_690_000_000_000_000 + si * 1_000_000,
            unit="us", utc=True,
        ).tz_localize(None)
        kind = si % 3
        if kind == 0:
            vals = np.repeat(rng.integers(0, 50, n // 100) * 1.0, 100).astype(np.float32)
        elif kind == 1:
            vals = (np.arange(n) * 0.35 + 7).astype(np.float32)
        else:
            vals = rng.normal(0, 40, n).astype(np.float32)
        frames.append(pd.DataFrame({"timestamp": ts, "value": vals, "s": f"s{si}"}))
    engine.write("rz", spark.createDataFrame(pd.concat(frames)))

    for every, sql_w in (("7 minutes", 420_000_000), ("23 minutes", 1_380_000_000)):
        got = {
            (r.bucket, r.s): (r.count_value, r.min_value, r.max_value, round(r.sum_value, 4))
            for r in engine.resample(
                "rz", every, {"value": ["count", "min", "max", "sum"]}, group_by=["s"]
            ).collect()
        }
        ref = {
            (r.b, r.s): (r.c, r.mn, r.mx, round(r.sm, 4))
            for r in engine.table("rz")
            .withColumn(
                "b",
                F.timestamp_micros(
                    F.expr(f"unix_micros(timestamp) - pmod(unix_micros(timestamp), {sql_w})")
                ),
            )
            .groupBy("b", "s")
            .agg(
                F.count("*").alias("c"), F.min("value").alias("mn"),
                F.max("value").alias("mx"), F.sum("value").alias("sm"),
            )
            .collect()
        }
        assert got == ref and len(ref) > 20, (every, len(got), len(ref))
