"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, schema width, and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from modelardb_rs_spark.session import make_spark
from modelardb_rs_spark.sources.testdata import TABLES


_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date", "binary": "bytes",
}

_DUCK_KIND = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "HUGEINT": "hugeint", "UTINYINT": "int", "USMALLINT": "int",
    "UINTEGER": "int", "UBIGINT": "int", "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts", "DATE": "date", "BLOB": "bytes", "NUMBER": "float",
}


def type_kinds(spark_dtypes, oracle_cols, oracle_types) -> list[str]:
    """Driver-grade type check: the driver hashes typed values (HUGEINT and
    DECIMAL surface differently from BIGINT/DOUBLE), so flag any column whose
    Spark kind differs from its oracle kind, by matching column name."""
    spark_by_name = {n.lower(): _SPARK_KIND.get(t, t) for n, t in spark_dtypes}
    problems = []
    for name, duck_t in zip(oracle_cols, oracle_types):
        name, duck_t = name.lower(), str(duck_t)
        kind = _DUCK_KIND.get(duck_t, duck_t)
        if duck_t.startswith("DECIMAL"):
            kind = "decimal"
        sk = spark_by_name.get(name)
        if sk is None:
            continue
        if kind == "hugeint":
            problems.append(f"col {name}: oracle HUGEINT (bare sum(int)?) vs spark {sk} — CAST AS BIGINT")
        elif kind == "decimal":
            problems.append(f"col {name}: oracle DECIMAL vs spark {sk} — cast to DOUBLE/BIGINT")
        elif {kind, sk} == {"int", "float"}:
            problems.append(f"col {name}: int-vs-float mismatch: spark {sk}, oracle {kind}")
        elif kind != sk:
            problems.append(f"col {name}: kind {sk} (spark) vs {kind} (oracle)")
    return problems


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
    # doc_train_export caches its written shards under a /tmp marker
    # keyed by (sf, chain version): clear it (as bench.py does) so the
    # gate exercises the CURRENT export code, not a prior run's files —
    # a stale cache would let a newly broken writer pass.
    entry.clear_caches(kinds=("trainexport",))
    spark = make_spark(app_name="correctness-check")
    # warm the session (executor launch + first-job scheduling, ~5 s)
    # OUTSIDE any entry's timer: without this the first entry's wall in
    # the per-entry runtime table is startup, not the entry. The pandas
    # round-trip also warms the Python-worker pool + Arrow codecs —
    # otherwise the first mapInPandas-heavy entry absorbs them (~8 s
    # measured on the round-10 first-position entry).
    spark.range(1000).repartition(4).count()
    spark.createDataFrame([(1.0,)], "x double").mapInPandas(
        lambda it: it, schema="x double"
    ).collect()
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
            rel = con.sql(oracles[name])
            oracle_cols = list(rel.columns)
            oracle_types = [str(t) for t in rel.types]
            oracle_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(oracle_rows)}")
        if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
            problems.append(f"schema {sorted(spark_cols)} vs {sorted(oracle_cols)}")
        problems.extend(type_kinds(df.dtypes, oracle_cols, oracle_types))
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
