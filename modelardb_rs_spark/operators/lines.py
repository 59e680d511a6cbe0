"""Corpus-level line deduplication (boilerplate removal).

The C4 / RefinedWeb / MassiveText pipelines all drop *lines* that recur
across many documents — navigation menus, cookie banners, license
footers — rather than whole-document duplicates. This module implements
that operator Spark-first:

1. explode documents into (doc_id, line_no, line);
2. one shuffle keyed by the normalized line to count how many DISTINCT
   documents each line occurs in;
3. mark lines above the threshold and rebuild each document without
   them (order preserved via the original line number).

Scale shape: the only data-sized shuffles are (a) the per-line
distinct-doc count, keyed by the line text — heavy hitters ("Home") are
single hot keys whose partial counts combine map-side, and AQE splits
any skewed reduce bucket — and (b) the per-doc rebuild keyed by
doc_id. No pairwise doc×doc work anywhere; cost is O(total lines).

Everything is Column algebra (split / explode / groupBy / array_sort),
so the whole pipeline stays in the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(line: Column) -> Column:
    """Normalization used for matching lines across documents: trim and
    collapse inner whitespace, case-fold. Matching is on the normalized
    form; removal drops the original line."""
    return F.lower(F.regexp_replace(F.trim(line), r"\s+", " "))


def explode_lines(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, line_no, line, norm) — one row per line of every document.
    NULL text counts as empty: split(NULL) is NULL and posexplode would
    emit no rows, silently dropping the document from every downstream
    grouped output — coalescing keeps the one-row-per-document
    contract of remove_common_lines."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(parallelism, F.col(id_col))
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("line_no", "line"),
        )
        .withColumn("norm", _norm(F.col("line")))
    )


def common_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Normalized lines occurring in at least ``min_docs`` distinct
    documents: (norm, n_docs, n_occurrences). Blank lines are never
    considered boilerplate (they are structure, not content)."""
    ex = explode_lines(df, text_col, id_col).where(F.col("norm") != "")
    return (
        ex.groupBy("norm")
        .agg(
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def remove_common_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus with cross-document boilerplate lines removed.

    Returns (id_col, text_col, n_lines_kept, n_lines_removed); documents
    whose every line was boilerplate survive with empty text, so the
    output always has one row per input row (filter on n_lines_kept to
    drop husks).
    """
    ex = explode_lines(df, text_col, id_col)
    # The common set derives from the SAME exploded frame — not from a
    # second explode_lines(df) — with an explicit isnotnull(id) filter
    # that mirrors the filter a caller's join on id_col infers onto the
    # reconstruction branch. Both branches' subtrees then canonicalize
    # identically and AQE's runtime stage reuse runs the scan + doc-keyed
    # exchange ONCE (guide §2.4; before: two full corpus scans+shuffles,
    # zero ReusedExchange). count_distinct already ignores NULL ids, so
    # the filter cannot change which lines clear min_docs.
    common = (
        ex.where((F.col("norm") != "") & F.col(id_col).isNotNull())
        .groupBy("norm")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("norm")
    )
    marked = ex.join(common.withColumn("__common__", F.lit(True)), "norm", "left")
    kept = F.filter(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("line_no"),
                    F.col("line"),
                    F.coalesce(F.col("__common__"), F.lit(False)).alias("is_common"),
                )
            )
        ),
        lambda x: ~x.is_common,
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.array_join(F.transform(kept, lambda x: x.line), "\n").alias(text_col),
            F.size(kept).cast("long").alias("n_lines_kept"),
            (F.count("*") - F.size(kept)).cast("long").alias("n_lines_removed"),
        )
    )
