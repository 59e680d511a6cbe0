"""SQL dialect extensions — a thin pre-parser over ``spark.sql``.

Reference: the custom ``ModelarDbDialect`` intercepts
``CREATE TIME SERIES TABLE`` / ``INCLUDE`` / ``TRUNCATE`` / ``VACUUM``
and passes every other statement through to the inherited SQL engine
(crates/modelardb_storage/src/parser.rs:58-160,226-312,465-632,695-707).
This module does the same with regexes: it classifies one statement into
a ``ModelarStatement`` the Engine executes; unrecognized statements fall
through to Spark SQL unchanged. One statement per call, as in the
reference (parser.rs:87-90).

Grammar accepted for time series DDL (parser.rs:226-312):

    CREATE TIME SERIES TABLE name(
        col TIMESTAMP,
        col FIELD | col FIELD(0.5) | col FIELD(5.0%) | col FIELD AS (expr),
        col TAG, ...
    )
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from modelardb_rs_spark.types import ErrorBound, GeneratedColumn, TimeSeriesTableMetadata

_CREATE_TS = re.compile(
    r"^\s*CREATE\s+TIME\s+SERIES\s+TABLE\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*\((?P<cols>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# Plain column-list form only (reference parser.rs:58-160 CREATE TABLE);
# Spark-specific variants (USING/AS SELECT/...) stay passthrough.
_CREATE_NORMAL = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*\((?P<cols>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE = re.compile(
    r"^\s*TRUNCATE\s+(?P<cluster>CLUSTER\s*)?(?:TABLE\s+)?"
    r"(?P<tables>[A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*)?\s*;?\s*$",
    re.IGNORECASE,
)
_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES = re.compile(r"^\s*SHOW\s+TABLES\s*;?\s*$", re.IGNORECASE)
_DESCRIBE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$",
    re.IGNORECASE,
)
# Retention DELETE: a single strictly-before (or at-most) predicate on
# one column; anything else is rejected with a clear error, not
# silently misread or passed through to Spark (the engine is otherwise
# append-only, SURVEY §1.4). _DELETE_PREFIX catches every other
# DELETE shape so it can be REFUSED instead of reaching spark.sql and
# failing with an unrelated Catalyst error.
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+WHERE\s+"
    r"(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<op><=?)\s*"
    r"(?P<lit>(?:TIMESTAMP\s*|DATE\s*)?'[^']+'|\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_DELETE_PREFIX = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE
)
# EXPLAIN ANALYZE <stmt>: executes instrumented with runtime decode
# counters (engine.explain_path(analyze=True)). Plain EXPLAIN stays a
# passthrough to Spark's own EXPLAIN.
_EXPLAIN_ANALYZE = re.compile(
    r"^\s*EXPLAIN\s+ANALYZE\s+(?P<stmt>.+)$", re.IGNORECASE | re.DOTALL
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+TARGET\s+(?P<target>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"^\s*VACUUM(?P<cluster>\s+CLUSTER)?"
    r"(?:\s+(?P<tables>[A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*))?"
    r"(?:\s+RETAIN\s+(?P<retain>\d+))?\s*;?\s*$",
    re.IGNORECASE,
)

# reference cap (types.rs:66): i64::MAX milliseconds expressed in seconds
MAX_RETENTION_PERIOD_IN_SECONDS = (2**63 - 1) // 1000
_INCLUDE = re.compile(
    r"^\s*INCLUDE\s+(?P<addrs>'[^']+'(?:\s*,\s*'[^']+')*)\s+(?P<select>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?(?P<query>(?:SELECT|VALUES)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


@dataclass
class ModelarStatement:
    kind: str  # create_time_series | create_normal | truncate | drop | vacuum | include | passthrough
    sql: str
    tables: list[str] = field(default_factory=list)
    ts_metadata: TimeSeriesTableMetadata | None = None
    retain_seconds: int | None = None
    include_addresses: list[str] = field(default_factory=list)
    select_sql: str | None = None
    insert_columns: list[str] = field(default_factory=list)
    delete_column: str | None = None
    delete_op: str | None = None  # "<" | "<="
    delete_literal: str | None = None  # "TIMESTAMP '...'" or epoch-µs digits
    if_exists: bool = False
    cluster: bool = False
    target_file_bytes: int | None = None
    columns_ddl: str | None = None  # create_normal: Spark DDL column list


def _split_top_level_commas(s: str) -> list[str]:
    """Split on commas not nested inside parentheses (needed because
    FIELD AS (expr) expressions may contain commas)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


_COL_TS = re.compile(r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+TIMESTAMP$", re.IGNORECASE)
_COL_TAG = re.compile(r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+TAG$", re.IGNORECASE)
_COL_FIELD = re.compile(
    r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+FIELD"
    r"(?:\s*\(\s*(?P<bound>\d+(?:\.\d+)?)\s*(?P<pct>%)?\s*\))?$",
    re.IGNORECASE,
)
_COL_GENERATED = re.compile(
    r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+FIELD\s+AS\s*\((?P<expr>.+)\)$",
    re.IGNORECASE | re.DOTALL,
)


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# non-column words that legally appear in generated expressions
_EXPR_KEYWORDS = {
    "and", "or", "not", "case", "when", "then", "else", "end", "cast", "as",
    "is", "in", "between", "like", "div", "true", "false", "null", "interval",
    "tinyint", "smallint", "int", "integer", "bigint", "float", "real",
    "double", "decimal", "string", "boolean", "date", "timestamp",
}


def _expr_identifiers(expr: str) -> list[str]:
    """Column identifiers referenced by a generated expression: bare
    words that are not string literals, function calls, or keywords."""
    s = re.sub(r"'[^']*'", "", expr)
    out = []
    for m in _IDENT.finditer(s):
        if s[m.end():].lstrip().startswith("("):
            continue  # function call
        if m.group(0).lower() in _EXPR_KEYWORDS:
            continue
        out.append(m.group(0))
    return out


def parse_create_time_series(name: str, cols_src: str) -> TimeSeriesTableMetadata:
    timestamp_column: str | None = None
    fields: dict[str, ErrorBound] = {}
    tags: list[str] = []
    generated: list[GeneratedColumn] = []
    for col_src in _split_top_level_commas(cols_src):
        if m := _COL_TS.match(col_src):
            if timestamp_column is not None:
                raise ValueError("exactly one TIMESTAMP column is required")
            timestamp_column = m["name"]
        elif m := _COL_TAG.match(col_src):
            tags.append(m["name"])
        elif m := _COL_GENERATED.match(col_src):
            generated.append(GeneratedColumn(m["name"], m["expr"].strip()))
        elif m := _COL_FIELD.match(col_src):
            if m["bound"] is None:
                bound = ErrorBound.lossless()
            elif m["pct"]:
                bound = ErrorBound.relative(float(m["bound"]))
            else:
                value = float(m["bound"])
                bound = ErrorBound.lossless() if value == 0.0 else ErrorBound.absolute(value)
            fields[m["name"]] = bound
        else:
            raise ValueError(f"cannot parse column definition: {col_src!r}")
    if timestamp_column is None:
        raise ValueError("a time series table requires a TIMESTAMP column")
    all_names = [timestamp_column, *fields, *tags, *[g.name for g in generated]]
    dupes = {n for n in all_names if all_names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate column name(s): {sorted(dupes)}")
    # Generated columns may reference only STORED columns — a generated
    # expression over another generated column is rejected at CREATE
    # time like the reference (parser.rs:274-289, types.rs:339-360),
    # instead of silently depending on declaration order at read time.
    stored = {timestamp_column, *fields, *tags}
    gen_names = {g.name for g in generated}
    for g in generated:
        for ref in _expr_identifiers(g.expr_sql):
            if ref in gen_names:
                raise ValueError(
                    f"generated column {g.name!r} references generated column "
                    f"{ref!r}; only stored columns may be referenced"
                )
            if ref not in stored:
                raise ValueError(
                    f"generated column {g.name!r} references unknown column {ref!r}"
                )
    return TimeSeriesTableMetadata(
        name=name,
        timestamp_column=timestamp_column,
        field_columns=fields,
        tag_columns=tags,
        generated_columns=generated,
    )


def parse_statement(sql: str) -> ModelarStatement:
    if m := _CREATE_TS.match(sql):
        meta = parse_create_time_series(m["name"], m["cols"])
        return ModelarStatement(kind="create_time_series", sql=sql, tables=[m["name"]], ts_metadata=meta)
    if m := _CREATE_NORMAL.match(sql):
        return ModelarStatement(
            kind="create_normal", sql=sql, tables=[m["name"]], columns_ddl=m["cols"]
        )
    if m := _INCLUDE.match(sql):
        addrs = [a.strip().strip("'") for a in m["addrs"].split(",")]
        return ModelarStatement(kind="include", sql=sql, include_addresses=addrs, select_sql=m["select"])
    if m := _INSERT.match(sql):
        cols = [c.strip() for c in m["cols"].split(",")] if m["cols"] else []
        return ModelarStatement(
            kind="insert", sql=sql, tables=[m["name"]], select_sql=m["query"], insert_columns=cols
        )
    if (m := _TRUNCATE.match(sql)) and (m["tables"] or m["cluster"]):
        tables = [t.strip() for t in m["tables"].split(",")] if m["tables"] else []
        return ModelarStatement(
            kind="truncate", sql=sql, tables=tables, cluster=bool(m["cluster"])
        )
    if m := _DROP.match(sql):
        return ModelarStatement(
            kind="drop", sql=sql, tables=[m["name"]], if_exists=bool(m["ifex"])
        )
    if _SHOW_TABLES.match(sql):
        return ModelarStatement(kind="show_tables", sql=sql)
    if m := _DESCRIBE.match(sql):
        return ModelarStatement(kind="describe", sql=sql, tables=[m["name"]])
    if m := _EXPLAIN_ANALYZE.match(sql):
        return ModelarStatement(kind="explain_analyze", sql=sql, select_sql=m["stmt"])
    if m := _DELETE.match(sql):
        return ModelarStatement(
            kind="delete",
            sql=sql,
            tables=[m["name"]],
            delete_column=m["col"],
            delete_op=m["op"],
            delete_literal=m["lit"],
        )
    if m := _DELETE_PREFIX.match(sql):
        raise ValueError(
            f"unsupported DELETE on {m['name']!r}: only time-range retention "
            "of the form DELETE FROM t WHERE <timestamp_col> < TIMESTAMP "
            "'...' (or <=, or an epoch-µs integer, or DATE '...') is "
            "supported — qualified columns, compound predicates, and "
            "row-level deletes are not"
        )
    if m := _OPTIMIZE.match(sql):
        return ModelarStatement(
            kind="optimize",
            sql=sql,
            tables=[m["name"]],
            target_file_bytes=int(m["target"]) if m["target"] else None,
        )
    if m := _VACUUM.match(sql):
        tables = [t.strip() for t in m["tables"].split(",")] if m["tables"] else []
        retain = int(m["retain"]) if m["retain"] else None
        if retain is not None and retain > MAX_RETENTION_PERIOD_IN_SECONDS:
            raise ValueError(
                f"retention period cannot be more than {MAX_RETENTION_PERIOD_IN_SECONDS} seconds"
            )
        return ModelarStatement(
            kind="vacuum", sql=sql, tables=tables, retain_seconds=retain,
            cluster=bool(m["cluster"]),
        )
    return ModelarStatement(kind="passthrough", sql=sql)
