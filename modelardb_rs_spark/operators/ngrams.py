"""Corpus n-gram statistics: the frequency tables a tokenizer/vocab
build or a contamination audit starts from.

``top_ngrams`` counts word n-grams corpus-wide (occurrences, not
distinct-per-doc — this is the frequency table, unlike dedup's shingle
sets) and returns the k heaviest. Shape: one explode + one groupBy on
the gram (partial counts combine map-side; "of the" is one hot reduce
key AQE can split) + Spark's TakeOrdered for the top-k — no sort of
the full gram table. O(total grams) work, O(k) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_rs_spark.operators.text import tokens


def ngram_counts(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(ngram, n_occurrences, n_docs) for every word n-gram in the
    corpus. Documents shorter than n tokens contribute nothing."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    ex = df.select(
        F.col(id_col),
        F.explode(F.when(F.size(toks) >= n, grams).otherwise(F.array())).alias("ngram"),
    )
    return ex.groupBy("ngram").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct(id_col).alias("n_docs"),
    )


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The k most frequent n-grams, deterministically ordered
    (occurrences desc, then the gram itself)."""
    return (
        ngram_counts(df, n, text_col, id_col)
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )
