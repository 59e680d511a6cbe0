"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, schema width, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import TABLES


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, normalize value types, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = make_spark(app_name="correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            oracle_cols = [d[0] for d in cur.description]
            oracle_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(oracle_rows)}")
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
            problems.append(f"schema {sorted(spark_cols)} vs {sorted(oracle_cols)}")
        if not problems:
            a = normalize(spark_rows, spark_cols)
            b = normalize(oracle_rows, oracle_cols)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_rows)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
