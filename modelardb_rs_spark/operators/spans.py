"""Substring-level (span) deduplication — remove the exact repeated
PASSAGES inside otherwise-unique documents.

Document-level dedup (operators/dedup.py) keeps one copy of each
near-identical document; what it cannot touch is the boilerplate
paragraph pasted into thousands of otherwise-distinct pages. The public
pipelines handle this with exact substring dedup (suffix-array spans in
"Deduplicating Training Data Makes Language Models Better"; paragraph
hashes in Dolma/RefinedWeb). A distributed suffix array is not a Spark
shape; the equivalent Spark-first construction is token n-gram
fingerprints:

1. explode every token position's ``span``-gram, fingerprinted to one
   64-bit-ish hash (O(total tokens) rows, the only data-sized stage),
2. count fingerprints corpus-wide (one shuffle on the gram key); grams
   occurring in >= ``min_dups`` DOCUMENTS are duplicated passages,
3. semi-join occurrences back to the duplicated grams (bucket-sized
   work) giving per-doc covered token intervals [pos, pos+span),
4. merge overlapping intervals per document with one window
   (gaps-and-islands) — the merged spans ARE the duplicated passages.

``remove_duplicated_spans`` rebuilds each document's text from the
tokens outside every merged span. Any n-gram that appears in
``min_dups`` documents is removed from ALL of them (the Lee et al.
policy: repeated substrings carry no new information anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_rs_spark.operators.text import tokens


def _gram_occurrences(
    df: DataFrame, span: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, gram) — every token position's span-gram fingerprint.
    pos is 0-based; a doc with n tokens yields max(n - span + 1, 0)
    rows."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t__"))
    n = F.size("__t__")
    pos = F.explode(F.sequence(F.lit(0), n - F.lit(span))).alias("pos")
    with_pos = toks.where(n >= span).select(id_col, "__t__", pos)
    # the separator must be a character no token can contain: tokens are
    # whitespace-split, so a single space is airtight — a collision-prone
    # separator would let distinct sequences with the same concatenation
    # (['ab','c'] vs ['a','bc']) fuse into one gram and delete text that
    # was never actually repeated. The fingerprint is TWO independent
    # xxhash64 longs (seeded differently) packed in one struct — a
    # 16-byte fixed-width key, still ~2x narrower than the md5 hex
    # strings that were the measured shuffle cliff at 4M docs
    # (SCALE.md). One 64-bit hash is NOT enough at the 100 TB target:
    # ~1e13 grams expect millions of 64-bit colliding pairs, each of
    # which fuses two distinct grams and can silently delete text that
    # was never repeated; 128 bits puts the expected collision count at
    # ~1e-13. A gram fuses only if BOTH hashes collide. The DuckDB
    # oracles keep md5; outputs agree because only gram EQUALITY
    # matters.
    s = F.array_join(F.slice("__t__", F.col("pos") + 1, span), " ")
    gram = F.struct(
        F.xxhash64(s).alias("h1"), F.xxhash64(s, F.lit(0x5BD1)).alias("h2")
    ).alias("gram")
    return with_pos.select(id_col, "pos", gram)


def duplicated_spans(
    df: DataFrame,
    span: int = 20,
    min_dups: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged duplicated token intervals per document:
    (id_col, span_start, span_end) — token positions, end exclusive. A
    position interval is covered iff one of its span-grams occurs in at
    least ``min_dups`` distinct documents."""
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")
    occ = _gram_occurrences(df, span, text_col, id_col)
    if min_dups == 2:
        # nd >= 2 is exactly min(id) != max(id), and min/max get true
        # map-side partial aggregation in ONE exchange on gram; the
        # count_distinct form plans as a distinct-pair aggregate whose
        # first exchange ships every (gram, id) pair — a second
        # data-sized shuffle this branch removes outright
        dup_grams = (
            occ.groupBy("gram")
            .agg(F.min(id_col).alias("__mn__"), F.max(id_col).alias("__mx__"))
            .where(F.col("__mn__") != F.col("__mx__"))
            .select("gram")
        )
    else:
        dup_grams = (
            occ.groupBy("gram")
            .agg(F.count_distinct(id_col).alias("nd"))
            .where(F.col("nd") >= min_dups)
            .select("gram")
        )
    hits = occ.join(dup_grams, "gram").select(
        id_col, F.col("pos").alias("lo"), (F.col("pos") + span).alias("hi")
    )
    # gaps-and-islands merge per doc: a new island starts where lo
    # exceeds the running max hi of all earlier intervals
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("lo", "hi")
    prev_max = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = hits.withColumn(
        "new_island", F.when(prev_max.isNull() | (F.col("lo") > prev_max), 1).otherwise(0)
    ).withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(F.min("lo").alias("span_start"), F.max("hi").alias("span_end"))
        .drop("island")
        .select(id_col, "span_start", "span_end")
    )


def remove_duplicated_spans(
    df: DataFrame,
    span: int = 20,
    min_dups: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus with duplicated passages removed: text rebuilt from
    the tokens outside every merged span (single-space joined — span
    removal is token-level, so original whitespace inside removed
    regions is gone by construction). Output: (id_col, text_col,
    n_tokens_kept, n_tokens_removed); every input row survives."""
    spans = duplicated_spans(df, span, min_dups, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans__")
    )
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t__")
    ).join(per_doc, id_col, "left")
    # keep token i iff no span covers it; spans are disjoint and few per
    # doc after merging, so the filter predicate is a small array scan
    covered = lambda i: F.exists(
        F.coalesce(F.col("__spans__"), F.array()),
        lambda s: (s["span_start"] <= i) & (i < s["span_end"]),
    )
    kept = F.filter(
        F.transform("__t__", lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda p: ~covered(p["i"]),
    )
    return toks.select(
        id_col,
        F.array_join(F.transform(kept, lambda p: p["t"]), " ").alias(text_col),
        F.size(kept).alias("n_tokens_kept"),
        (F.size("__t__") - F.size(kept)).alias("n_tokens_removed"),
    )
