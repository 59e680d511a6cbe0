"""Fuzz the aggregate-pushdown SQL rewrite: for randomly generated
simple aggregate statements, the rewritten (segment-stats) result must
match plain spark.sql over the gridded view — the engine-level version
of the reference's plan-equivalence oracle."""

import datetime
import itertools
import random

import pytest
from pyspark.sql import Row


TS0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
AGGS = ["count", "min", "max", "sum", "avg"]


@pytest.fixture(scope="module")
def fuzz_engine(spark, tmp_path_factory):
    from modelardb_rs_spark.engine import Engine

    eng = Engine(spark, str(tmp_path_factory.mktemp("fuzz_folder")))
    eng.read_sql(
        "CREATE TIME SERIES TABLE fz(timestamp TIMESTAMP, a FIELD, b FIELD(0.5), "
        "site TAG, unit TAG)"
    )
    rng = random.Random(7)
    rows = [
        Row(
            timestamp=TS0 + datetime.timedelta(seconds=i),
            a=float(rng.randint(0, 50)),
            b=rng.uniform(-100, 100),
            site=f"s{i % 3}",
            unit=f"u{i % 2}",
        )
        for i in range(2000)
    ]
    eng.write("fz", spark.createDataFrame(rows))
    return eng


def canonical(rows, ndigits=6):
    out = []
    for r in rows:
        vals = []
        for v in r:
            vals.append(round(v, ndigits) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=str)


def test_fuzz_rewrite_matches_gridded(fuzz_engine):
    rng = random.Random(13)
    cases = 0
    for _ in range(25):
        n_aggs = rng.randint(1, 3)
        items = []
        for j in range(n_aggs):
            func = rng.choice(AGGS)
            col = rng.choice(["a", "b", "*"] if func == "count" else ["a", "b"])
            items.append(f"{func}({col}) AS x{j}")
        where = ""
        if rng.random() < 0.5:
            conds = [f"site = 's{rng.randint(0, 2)}'"]
            if rng.random() < 0.4:
                conds.append(f"unit = 'u{rng.randint(0, 1)}'")
            where = " WHERE " + " AND ".join(conds)
        group = ""
        group_cols = ""
        if rng.random() < 0.5:
            gcols = rng.sample(["site", "unit"], rng.randint(1, 2))
            group = " GROUP BY " + ", ".join(gcols)
            group_cols = ", ".join(gcols) + ", "
        sql = f"SELECT {group_cols}{', '.join(items)} FROM fz{where}{group}"

        fast = fuzz_engine.read_sql(sql)
        # the same statement with a rewrite-defeating predicate runs on
        # the gridded view through plain spark.sql
        defeat = " AND " if where else " WHERE "
        slow_sql = sql.replace(group, "") + defeat + "timestamp >= timestamp '1970-01-01'" + group
        slow = fuzz_engine.read_sql(slow_sql)

        f_rows = canonical([tuple(r) for r in fast.collect()])
        s_rows = canonical([tuple(r) for r in slow.collect()])
        assert f_rows == s_rows, f"mismatch for {sql!r}:\n{f_rows[:3]}\nvs\n{s_rows[:3]}"
        cases += 1
    assert cases == 25
