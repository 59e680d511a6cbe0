"""Model-based lifecycle consistency: a scripted interleaving of
append / expire / optimize / resegment / time travel must always agree
with a plain in-memory model of the table's points — the transactional
layer's end-to-end invariant."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _us(minutes: float) -> datetime.datetime:
    return TS0 + datetime.timedelta(minutes=minutes)


def _engine_points(engine):
    return sorted(
        (int(r["timestamp"].replace(tzinfo=datetime.timezone.utc).timestamp()), r["v"], r["tag"])
        if r["timestamp"].tzinfo is None
        else (int(r["timestamp"].timestamp()), r["v"], r["tag"])
        for r in engine.table("lc").collect()
    )


def test_lifecycle_against_model(engine, spark):
    engine.read_sql("CREATE TIME SERIES TABLE lc(timestamp TIMESTAMP, v FIELD, tag TAG)")
    model: list[tuple[int, float, str]] = []  # (epoch_s, value, tag)

    def append(minute_lo, minute_hi, tag, step=1):
        rows = [
            Row(timestamp=_us(m), v=float(m % 53), tag=tag)
            for m in range(minute_lo, minute_hi, step)
        ]
        engine.write("lc", spark.createDataFrame(rows))
        model.extend((int(_us(m).timestamp()), float(m % 53), tag) for m in range(minute_lo, minute_hi, step))

    def expire(minute):
        cutoff = _us(minute)
        engine.expire("lc", cutoff)
        cut = int(cutoff.timestamp())
        model[:] = [p for p in model if p[0] >= cut]

    def check():
        assert _engine_points(engine) == sorted(model)
        # pushdown agg must agree with the model too
        agg = engine.read_sql(
            "SELECT count(v) AS n, round(sum(v), 2) AS s FROM lc"
        ).collect()[0]
        assert agg["n"] == len(model)
        assert abs((agg["s"] or 0.0) - round(sum(p[1] for p in model), 2)) < 1e-6

    append(0, 200, "a")
    append(0, 200, "b", step=2)
    check()

    expire(50)
    check()

    # out-of-order backfill BEFORE existing data is legal; expire cut
    # points < minute 50, so backfill 60..80 overlaps the kept range
    append(60, 80, "a")  # duplicates minutes 60..79 for tag a (dup points)
    check()

    engine.optimize("lc", target_file_bytes=64 << 10)
    check()

    engine.resegment("lc")
    check()

    expire(120)
    check()

    v_now = engine.folder.log("lc").snapshot().version
    append(300, 320, "c")
    check()

    # time travel sees the pre-append state
    old = engine.table("lc", version=v_now).count()
    assert old == len([p for p in model if p[2] != "c"])

    engine.truncate("lc")
    model.clear()
    check()
