"""Cross-series correlation: engine path (resample pushdown) and the
raw-points operator."""

import math

from pyspark.sql import functions as F

from modelardb_rs_spark.operators.correlate import series_correlation


def _write_three_series(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE corr_t(timestamp TIMESTAMP, v FIELD, s TAG)"
    )
    # a: rising line; b: a scaled copy (corr +1); c: falling line (corr -1)
    rows = spark.range(200).selectExpr(
        "timestamp_micros(id * 60000000) AS timestamp",
        "CAST(id AS FLOAT) AS v",
        "'a' AS s",
    )
    rows_b = spark.range(200).selectExpr(
        "timestamp_micros(id * 60000000) AS timestamp",
        "CAST(id * 2.5 + 7 AS FLOAT) AS v",
        "'b' AS s",
    )
    rows_c = spark.range(200).selectExpr(
        "timestamp_micros(id * 60000000) AS timestamp",
        "CAST(200 - id AS FLOAT) AS v",
        "'c' AS s",
    )
    engine.write("corr_t", rows.union(rows_b).union(rows_c))


def test_engine_correlate(engine, spark):
    _write_three_series(engine, spark)
    out = {
        (r["series_a"], r["series_b"]): r
        for r in engine.correlate("corr_t", "v", every="10 minutes").collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert math.isclose(out[("a", "b")]["corr"], 1.0, abs_tol=1e-9)
    assert math.isclose(out[("a", "c")]["corr"], -1.0, abs_tol=1e-9)
    # 200 minutes of data in 10-minute buckets
    assert out[("a", "b")]["n_buckets"] == 20


def test_series_correlation_min_buckets(spark):
    pts = spark.createDataFrame(
        [(i * 1_000_000, float(i), "x") for i in range(10)]
        + [(i * 1_000_000, float(i % 3), "y") for i in range(10)]
        + [(0, 1.0, "lone")],
        "ts long, value double, s string",
    )
    out = series_correlation(
        pts, ["s"], bucket_us=2_000_000, ts_col="ts", min_buckets=3
    )
    pairs = {(r["series_a"], r["series_b"]) for r in out.collect()}
    # "lone" has a single bucket: below min_buckets with everyone
    assert pairs == {("x", "y")}


def test_interpolation_join(spark):
    from modelardb_rs_spark.operators.asof import interpolation_join

    right = spark.createDataFrame(
        [(0, 0.0, "k"), (10_000_000, 100.0, "k"), (20_000_000, 50.0, "k")],
        "ts long, v double, k string",
    )
    left = spark.createDataFrame(
        [(-1_000_000, "k"), (0, "k"), (2_500_000, "k"), (10_000_000, "k"),
         (15_000_000, "k"), (25_000_000, "k")],
        "ts long, k string",
    )
    out = {r["ts"]: r["v_interp"] for r in
           interpolation_join(left, right, "ts", ["k"], ["v"]).collect()}
    assert out[-1_000_000] is None           # before the span: strict
    assert out[0] == 0.0                     # exact match
    assert out[2_500_000] == 25.0            # linear between 0 and 100
    assert out[10_000_000] == 100.0          # exact match mid-series
    assert out[15_000_000] == 75.0           # descending segment
    assert out[25_000_000] is None           # after the span


def test_spectral_dominant_period(spark):
    import math as m

    from modelardb_rs_spark.operators.spectral import dominant_period, spectral_power

    hour = 3_600_000_000
    day = 24 * hour
    # 14 days of hourly samples: pure 24h sine for series 'daily',
    # pure 12h sine for 'half'
    rows = []
    for h in range(14 * 24):
        t = h * hour
        rows.append(("daily", t, m.sin(2 * m.pi * t / day)))
        rows.append(("half", t, m.sin(2 * m.pi * t / (day / 2))))
    df = spark.createDataFrame(rows, "s string, bucket long, v double")
    periods = [6 * hour, 12 * hour, day, 7 * day]
    dom = {r["series"]: r["period_us"] for r in dominant_period(df, ["s"], periods).collect()}
    assert dom == {"daily": day, "half": 12 * hour}
    # power concentrates in the right bin: >10x the next candidate
    p = {
        (r["series"], r["period_us"]): r["power"]
        for r in spectral_power(df, ["s"], periods).collect()
    }
    assert p[("daily", day)] > 10 * max(
        v for (s, per), v in p.items() if s == "daily" and per != day
    )
