"""Time-range retention (Engine.expire / DELETE FROM ... WHERE ts < X):
exactness, metadata-only fast path, time travel, and SQL surface."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _us(dt: datetime.datetime) -> int:
    return int(dt.timestamp() * 1_000_000)


def _points(engine, table="r"):
    df = engine.table(table)
    return sorted(
        (r["timestamp"], round(r["v"], 6), r["tag"]) for r in df.collect()
    )


@pytest.fixture()
def retained(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE r(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(minutes=i),
            v=float(i % 37) + 0.5,
            tag=t,
        )
        for i in range(600)
        for t in ("a", "b")
    ]
    engine.write("r", spark.createDataFrame(rows))
    return engine


def test_expire_matches_filtered_read_exactly(retained):
    cutoff = TS0 + datetime.timedelta(minutes=123)
    before = _points(retained)
    expected = [p for p in before if _us_ts(p[0]) >= _us(cutoff)]
    stats = retained.expire("r", cutoff)
    assert stats["files_removed"] + stats["files_rewritten"] >= 1
    assert _points(retained) == expected


def _us_ts(ts) -> int:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=datetime.timezone.utc)
    return int(ts.timestamp() * 1_000_000)


def test_metadata_only_when_no_file_straddles(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE m(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    for day in (1, 10):
        base = TS0 + datetime.timedelta(days=day)
        rows = [
            Row(timestamp=base + datetime.timedelta(seconds=i), v=float(i), tag="x")
            for i in range(100)
        ]
        engine.write("m", spark.createDataFrame(rows))
    stats = engine.expire("m", TS0 + datetime.timedelta(days=5))
    # the day-1 commit's file(s) fall entirely before the cutoff:
    # removed from the log without reading or writing any data
    assert stats["files_removed"] >= 1
    assert stats["files_rewritten"] == 0
    assert engine.table("m").count() == 100


def test_expire_preserves_lossy_reconstruction(engine, spark):
    engine.read_sql(
        "CREATE TIME SERIES TABLE l(timestamp TIMESTAMP, v FIELD(0.5), tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            v=float(i) + (0.3 if i % 2 else -0.3),
            tag="x",
        )
        for i in range(500)
    ]
    engine.write("l", spark.createDataFrame(rows))
    cutoff = TS0 + datetime.timedelta(seconds=137)
    before = {
        r["timestamp"]: r["v"]
        for r in engine.table("l").collect()
        if _us_ts(r["timestamp"]) >= _us(cutoff)
    }
    engine.expire("l", cutoff)
    after = {r["timestamp"]: r["v"] for r in engine.table("l").collect()}
    # kept points are VALUE-IDENTICAL (lossless re-encode of the
    # reconstruction), not merely within-bound again
    assert after == before


def test_time_travel_and_vacuum_after_expire(retained):
    v_before = retained.folder.log("r").snapshot().version
    n_before = retained.table("r").count()
    retained.expire("r", TS0 + datetime.timedelta(minutes=300))
    assert retained.table("r").count() < n_before
    assert retained.table("r", version=v_before).count() == n_before
    deleted = retained.vacuum(["r"], retain_seconds=0)
    assert retained.table("r").count() < n_before  # live set intact


def test_sql_delete_forms(retained):
    n = retained.table("r").count()
    retained.read_sql("DELETE FROM r WHERE timestamp < TIMESTAMP '2024-01-01 02:00:00'")
    kept = retained.table("r").count()
    assert 0 < kept < n
    # epoch-µs literal and <= are accepted too
    retained.read_sql(f"DELETE FROM r WHERE timestamp <= {_us(TS0 + datetime.timedelta(minutes=200))}")
    assert 0 < retained.table("r").count() < kept


def test_sql_delete_rejects_non_timestamp_and_normal(engine, spark):
    engine.read_sql("CREATE TIME SERIES TABLE t(timestamp TIMESTAMP, v FIELD, tag TAG)")
    engine.create_table("n", "a INT, b STRING")
    with pytest.raises(ValueError, match="timestamp column"):
        engine.read_sql("DELETE FROM t WHERE v < 5")
    with pytest.raises(ValueError, match="time series tables only"):
        engine.expire("n", 0)


def test_optimize_time_clusters_then_expire_metadata_only(engine, spark):
    """Streaming-style small commits hash-scatter time across files;
    OPTIMIZE range-partitions on (field, start_time) so the compacted
    files are near-disjoint time slices and a later expire removes old
    slices without rewriting anything."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE oc(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    for batch in range(4):
        rows = [
            Row(
                timestamp=TS0 + datetime.timedelta(minutes=batch * 500 + i),
                v=float(i % 17),
                tag=t,
            )
            for i in range(500)
            for t in ("a", "b")
        ]
        engine.write("oc", spark.createDataFrame(rows))
    res = engine.optimize("oc", target_file_bytes=64 << 10)
    assert res["compacted"] >= 2
    files = engine.folder.log("oc").snapshot().files
    spans = sorted(
        (f["min_start_time"], f["max_end_time"])
        for f in files
        if f.get("min_start_time") is not None
    )
    # time-clustered: the median file covers a small fraction of the span
    total = spans[-1][1] - spans[0][0]
    widths = sorted(hi - lo for lo, hi in spans)
    assert widths[len(widths) // 2] < total / 2
    n = engine.table("oc").count()
    stats = engine.expire("oc", TS0 + datetime.timedelta(minutes=1000))
    assert stats["files_removed"] >= 1
    # expire after optimize is mostly metadata work
    assert stats["files_removed"] >= stats["files_rewritten"]
    assert engine.table("oc").count() == n // 2


def test_downsample_expire_policy(engine, spark):
    """Rollup-then-expire: totals preserved across the two resolutions,
    watermark prevents double-rollup on the next run."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE p(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(hours=6 * i),
            v=float(i),
            tag=t,
        )
        for i in range(80)  # 20 days at 4 points/day
        for t in ("a", "b")
    ]
    engine.write("p", spark.createDataFrame(rows))
    total = engine.table("p").agg(F.sum("v")).collect()[0][0]

    out = engine.downsample_expire(
        "p", "p_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=10),
    )
    assert out["rolled_buckets"] == 20  # 10 days x 2 tags
    assert out["expired"]["files_removed"] + out["expired"]["files_rewritten"] >= 1
    rolled_sum = engine.table("p_daily").agg(F.sum("sum_v")).collect()[0][0]
    raw_sum = engine.table("p").agg(F.sum("v")).collect()[0][0]
    assert abs((rolled_sum + raw_sum) - total) < 1e-6
    raw_min = engine.table("p").agg(F.min("timestamp")).collect()[0][0]
    assert _us_ts(raw_min) >= _us(TS0 + datetime.timedelta(days=10))

    # second run extends the watermark without duplicating old buckets
    out2 = engine.downsample_expire(
        "p", "p_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=15),
    )
    assert out2["rolled_buckets"] == 10  # days 10-14 x 2 tags
    n_buckets = engine.table("p_daily").count()
    assert n_buckets == 30
    rolled_sum2 = engine.table("p_daily").agg(F.sum("sum_v")).collect()[0][0]
    raw_sum2 = engine.table("p").agg(F.sum("v")).collect()[0][0]
    assert abs((rolled_sum2 + raw_sum2) - total) < 1e-6


def test_resegment_merges_out_of_order(engine, spark):
    """Two interleaved batches produce overlapping segments per series;
    resegment merges them without changing a single point."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE z(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    evens = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), v=float(i), tag="x")
        for i in range(0, 1000, 2)
    ]
    odds = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), v=float(i), tag="x")
        for i in range(1, 1000, 2)
    ]
    # a second, always-in-order series must pass through verbatim
    clean = [
        Row(timestamp=TS0 + datetime.timedelta(seconds=i), v=1.5, tag="c")
        for i in range(500)
    ]
    engine.write("z", spark.createDataFrame(evens + clean))
    engine.write("z", spark.createDataFrame(odds))

    segs_before = engine.segments("z")
    n_x_before = segs_before.where(F.col("tag") == "x").count()
    clean_before = sorted(
        map(tuple, segs_before.where(F.col("tag") == "c")
            .select("start_time", "end_time", "value_count").collect())
    )
    pts_before = sorted(
        (r["timestamp"], r["v"], r["tag"]) for r in engine.table("z").collect()
    )
    res = engine.resegment("z")
    assert res["files_before"] >= 1
    pts_after = sorted(
        (r["timestamp"], r["v"], r["tag"]) for r in engine.table("z").collect()
    )
    assert pts_after == pts_before
    segs_after = engine.segments("z")
    # the interleaved series collapses to fewer, disjoint segments
    x_after = segs_after.where(F.col("tag") == "x").select(
        "start_time", "end_time"
    ).orderBy("start_time").collect()
    assert len(x_after) < n_x_before
    for a, b in zip(x_after, x_after[1:]):
        assert b["start_time"] > a["end_time"]
    # the clean series' segments are byte-for-byte the same rows
    clean_after = sorted(
        map(tuple, segs_after.where(F.col("tag") == "c")
            .select("start_time", "end_time", "value_count").collect())
    )
    assert clean_after == clean_before
    # pushdown stats still agree after the rewrite
    agg = engine.read_sql("SELECT count(v) AS n, round(sum(v), 2) AS s FROM z").collect()[0]
    assert agg["n"] == len(pts_before)


def test_expire_races_concurrent_appends(engine, spark):
    """Appends racing an expire must all survive when their data is
    after the cutoff — expire removes only snapshot-listed files, and
    its commit retries cleanly around interleaved append commits."""
    import threading

    engine.read_sql("CREATE TIME SERIES TABLE rc(timestamp TIMESTAMP, v FIELD, tag TAG)")
    old = [
        Row(timestamp=TS0 + datetime.timedelta(minutes=m), v=1.0, tag="old")
        for m in range(100)
    ]
    engine.write("rc", spark.createDataFrame(old))
    cutoff = TS0 + datetime.timedelta(minutes=200)

    errors = []

    def appender(i):
        try:
            rows = [
                Row(
                    timestamp=cutoff + datetime.timedelta(minutes=i * 1000 + m),
                    v=float(i),
                    tag=f"t{i}",
                )
                for m in range(50)
            ]
            engine.write("rc", spark.createDataFrame(rows))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def expirer():
        try:
            engine.expire("rc", cutoff)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=expirer))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # every racing append survives; the pre-cutoff data is gone
    # (run expire once more in case it won its race before some appends
    # committed — idempotent either way)
    engine.expire("rc", cutoff)
    got = engine.table("rc").groupBy("tag").count().collect()
    counts = {r["tag"]: r["count"] for r in got}
    assert counts == {"t0": 50, "t1": 50, "t2": 50}


def test_downsample_expire_keeps_late_data(engine, spark):
    """Out-of-order points below the rollup watermark must never be
    silently destroyed: a bucket the rollup lacks is rolled up from the
    late points; late points in already-rolled buckets survive the
    expire at raw resolution (the deletion window is bounded below by
    the watermark)."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE lp(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(hours=6 * i), v=1.0, tag="a")
        for i in range(40)  # days 0-9
    ]
    engine.write("lp", spark.createDataFrame(rows))
    out = engine.downsample_expire(
        "lp", "lp_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=5),
    )
    assert out["rolled_buckets"] == 5 and out["late_points_kept"] == 0

    # late arrivals BELOW the watermark: 2 into already-rolled day 2,
    # 3 into day -1 (a bucket the rollup has never seen)
    late = [
        Row(timestamp=TS0 + datetime.timedelta(days=2, minutes=m), v=100.0, tag="a")
        for m in (1, 2)
    ] + [
        Row(timestamp=TS0 - datetime.timedelta(hours=h), v=7.0, tag="a")
        for h in (1, 2, 3)
    ]
    engine.write("lp", spark.createDataFrame(late))

    out2 = engine.downsample_expire(
        "lp", "lp_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=7),
    )
    # days 5,6 rolled normally; day -1 caught up from late points and
    # its raw window expired (fully represented by the new rollup row)
    assert out2["rolled_buckets"] == 2
    assert out2["late_rolled_buckets"] == 1
    assert out2["late_points_kept"] == 2
    daily = {
        r["bucket"]: (r["count_v"], r["sum_v"])
        for r in engine.table("lp_daily").collect()
    }
    day_minus1 = TS0 - datetime.timedelta(days=1)
    assert daily[day_minus1.replace(tzinfo=None)] == (3, 21.0)
    # raw: the 5 late points survive; the normally-expired range is gone
    raw = engine.table("lp").select("timestamp", "v").collect()
    raw_us = sorted(_us_ts(r["timestamp"]) for r in raw)
    assert len([u for u in raw_us if u < _us(TS0 + datetime.timedelta(days=7))]) == 2
    # day-2 late points specifically survived
    assert sum(1 for r in raw if r["v"] == 100.0) == 2
    # totals: rollup + surviving raw covers everything exactly once
    rolled_sum = engine.table("lp_daily").agg(F.sum("sum_v")).collect()[0][0]
    raw_sum = engine.table("lp").agg(F.sum("v")).collect()[0][0]
    # rollup holds days 0-6 (7 buckets x 4 points) plus day -1 (21.0);
    # raw holds days 7-9 plus the two kept late points in rolled day 2
    assert abs(rolled_sum - (7 * 4 * 1.0 + 21.0)) < 1e-6
    assert abs(raw_sum - (3 * 4 * 1.0 + 200.0)) < 1e-6
    assert abs((rolled_sum + raw_sum) - (40 * 1.0 + 200.0 + 21.0)) < 1e-6


def test_resegment_whole_series_across_arrow_batches(engine, spark):
    """A dirty series whose segments span many Arrow batches must still
    come out disjoint: the grouped refit (applyInPandas per series)
    cannot be split by the ~N-rows-per-batch Arrow boundary the old
    mapInPandas path had."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE rs2(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    # many tiny interleaved writes -> many overlapping segments, one series
    for k in range(6):
        rows = [
            Row(
                timestamp=TS0 + datetime.timedelta(seconds=6 * i + k),
                v=float((i * 7 + k) % 13),
                tag="s",
            )
            for i in range(40)
        ]
        engine.write("rs2", spark.createDataFrame(rows))
    before = engine.table("rs2").collect()
    old_batch = engine.spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    engine.spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        engine.resegment("rs2")
    finally:
        if old_batch is None:
            engine.spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            engine.spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
    # postcondition: per series, segments disjoint and time-ordered
    segs = engine.segments("rs2").select("start_time", "end_time").collect()
    spans = sorted((r["start_time"], r["end_time"]) for r in segs)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2, f"overlap survived: ({s1},{e1}) vs ({s2},{e2})"
    # and not a single point changed
    after = engine.table("rs2").collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_downsample_expire_late_new_group_in_rolled_bucket(engine, spark):
    """A late point for a NEW tag group inside an already-rolled bucket
    must NOT be appended to the rollup (that would double-represent it:
    once rolled, once in the surviving raw) — it stays raw-only."""
    engine.read_sql(
        "CREATE TIME SERIES TABLE lg(timestamp TIMESTAMP, v FIELD, tag TAG)"
    )
    rows = [
        Row(timestamp=TS0 + datetime.timedelta(hours=6 * i), v=1.0, tag="a")
        for i in range(24)  # days 0-5, tag a only
    ]
    engine.write("lg", spark.createDataFrame(rows))
    engine.downsample_expire(
        "lg", "lg_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=3), group_by_tags=["tag"],
    )
    # late arrival: tag 'b' lands in rolled day 1
    late = [Row(timestamp=TS0 + datetime.timedelta(days=1, minutes=5), v=50.0, tag="b")]
    engine.write("lg", spark.createDataFrame(late))
    out = engine.downsample_expire(
        "lg", "lg_daily", "1 day", {"v": ["count", "sum"]},
        TS0 + datetime.timedelta(days=4), group_by_tags=["tag"],
    )
    assert out["late_rolled_buckets"] == 0  # bucket already rolled for 'a'
    assert out["late_points_kept"] == 1
    # rollup has no 'b' rows; the late point survives at raw resolution
    assert engine.table("lg_daily").where(F.col("tag") == "b").count() == 0
    raw = engine.table("lg").where(F.col("tag") == "b").collect()
    assert len(raw) == 1 and raw[0]["v"] == 50.0
    # totals cover every point exactly once across the two resolutions
    rolled_sum = engine.table("lg_daily").agg(F.sum("sum_v")).collect()[0][0]
    raw_sum = engine.table("lg").agg(F.sum("v")).collect()[0][0]
    assert abs((rolled_sum + raw_sum) - (24 * 1.0 + 50.0)) < 1e-6
