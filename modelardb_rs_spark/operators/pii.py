"""PII detection and redaction over document corpora.

The standard pre-training scrub (the public Dolma/CCNet/RefinedWeb
pipelines all carry a variant): find personally-identifiable spans with
conservative regexes, count them per document for filtering decisions,
and replace them with typed placeholder tokens for the kept documents.

Every pattern is written in the common RE2/Java subset (no lookarounds,
no backreferences) so the SAME pattern string runs in Spark's JVM regex,
RE2-based engines, and DuckDB — which is what makes these operators
oracle-checkable value-for-value against an independent SQL engine.

Scale shape: both operators are map-only Column algebra (regexp_count /
regexp_replace execute inside whole-stage codegen). No shuffle, no
Python, no state — at 100 TB this runs at scan bandwidth and
partitioning is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom, so more-specific patterns
# must precede patterns that could match a substring of theirs (emails
# before ipv4: "bob@1.2.3.4" style hosts; ssn/phone digit groupings are
# disjoint but keep the specific-first convention).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII span counts: (id, n_email, n_ssn, n_phone,
    n_ipv4, n_pii). Counting runs each pattern independently over the
    raw text, so an SSN also counted as a phone number is deliberate —
    counts answer "should this doc be dropped", not "how many spans
    will redaction rewrite"."""
    cols = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    out = df.select(F.col(id_col), *cols)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))


def pii_total(c: Column) -> Column:
    """Total PII span count as a pure Column expression (same
    independent-pattern semantics as ``pii_counts``'s ``n_pii``)."""
    total = None
    for _, pat in PII_PATTERNS:
        n = F.regexp_count(c, F.lit(pat)).cast("long")
        total = n if total is None else total + n
    return total


def redact_pii(text: Column) -> Column:
    """Replace every PII span with a typed placeholder (``<EMAIL>``,
    ``<SSN>``, ...). Applied in PII_PATTERNS order: once an SSN becomes
    ``<SSN>`` the phone pattern can no longer see its digits, so typed
    placeholders stay unambiguous."""
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with ``text_col`` redacted in place (schema unchanged)."""
    return df.withColumn(text_col, redact_pii(F.col(text_col)))


def pii_oracle_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """The DuckDB equivalent of ``pii_counts`` built from the SAME
    pattern strings (DuckDB lacks regexp_count; span counts come from
    len(regexp_extract_all))."""
    cols = ",\n               ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    total = " + ".join(f"len(regexp_extract_all({text_col}, '{pat}'))" for _, pat in PII_PATTERNS)
    return f"""
        SELECT {id_col},
               {cols},
               CAST({total} AS BIGINT) AS n_pii
        FROM {table}
    """
