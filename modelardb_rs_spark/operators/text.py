"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Column algebra (JVM-side, whole-stage-codegen'd,
no Python in the hot path) and deterministic, so each has an exact ANSI
SQL oracle. They scale trivially: map-only over the documents table, no
shuffle except for explicit aggregations.

Operators: tokenization stats, quality scoring, n-gram-free language
identification (stopword voting), document fingerprinting (normalized
md5 — the rolling-hash analog that is reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the heuristic language
# identifier. Token-exact matching (not substring), so Spark and any SQL
# oracle agree bit-for-bit.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "es": ("el", "los", "y", "las", "es", "una", "por", "como"),
    "fr": ("le", "la", "et", "les", "est", "une", "dans", "pour"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (empty text -> empty array)."""
    return F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_count(col: Column, words: tuple[str, ...]) -> Column:
    """Exact-token stopword occurrences (array filter, no regex)."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(wordset, t)))


# GPT-2-style pre-tokenizer shape: contraction suffixes, letter runs,
# digit runs, punctuation runs, whitespace runs. Restricted to RE2-safe
# syntax (no lookarounds) so SQL oracles can reproduce it exactly.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count: the number of GPT-2-pre-tokenizer-style
    pieces (a practical LLM-cost proxy that needs no vocabulary)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[.,!?;:]", ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts, mean token
    length, punctuation ratio, stopword ratio, and a composite score in
    [0, 1] (rounded for cross-engine stability)."""
    c = F.col(text_col)
    n_tok = token_count(c)
    n_char = F.length(c)
    stop = stopword_count(c, LANG_STOPWORDS["en"])
    out = df.withColumn("n_tokens", n_tok).withColumn("n_chars_m", n_char)
    out = out.withColumn(
        "mean_token_len",
        F.round(F.when(F.col("n_tokens") > 0, n_char / F.col("n_tokens")).otherwise(F.lit(0.0)), 4),
    )
    out = out.withColumn(
        "punct_ratio",
        F.round(F.when(n_char > 0, punct_count(c) / n_char).otherwise(F.lit(0.0)), 4),
    )
    out = out.withColumn(
        "stopword_ratio",
        F.round(F.when(F.col("n_tokens") > 0, stop / F.col("n_tokens")).otherwise(F.lit(0.0)), 4),
    )
    # Composite score: enough tokens, some stopwords, not punctuation soup.
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 4))


def quality_score(c: Column) -> Column:
    """The composite quality score as a pure Column expression —
    bit-identical to ``quality_features``'s ``quality_score`` (same
    intermediate rounding), without materializing the feature columns
    or requiring a join."""
    n_tok = token_count(c)
    n_char = F.length(c)
    stop = stopword_count(c, LANG_STOPWORDS["en"])
    stop_ratio = F.round(
        F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0)), 4
    )
    punct_ratio = F.round(
        F.when(n_char > 0, punct_count(c) / n_char).otherwise(F.lit(0.0)), 4
    )
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return F.round(score, 4)


def language_pred(c: Column) -> Column:
    """The language-id prediction as a pure Column expression — usable
    without a join wherever the text column is in scope (the quality
    gate composes signals map-only this way)."""
    counts = {lang: stopword_count(c, words) for lang, words in sorted(LANG_STOPWORDS.items())}
    best_count = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(counts[lang] == best_count, F.lit(lang)).otherwise(pred)
    return F.when(best_count == 0, F.lit("und")).otherwise(pred)


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "predicted_lang") -> DataFrame:
    """Heuristic language identification by stopword voting.

    argmax over per-language exact-token stopword counts; deterministic
    alphabetical tie-break (first language wins ties), 'und'
    (undetermined) when no stopword of any language occurs.
    """
    return df.withColumn(out_col, language_pred(F.col(text_col)))


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals in the style of the Gopher /
    MassiveText filtering rules (Rae et al. 2021, publicly described):
    highly repetitive documents are low-quality training data.

    Emits per document:
      - ``n_tokens``       whitespace token count
      - ``dup_token_frac`` 1 - distinct_tokens/n_tokens (0 for empty)
      - ``top_bigram``     the most frequent word 2-gram (ties broken by
                           lexicographically smallest; NULL if < 2 tokens)
      - ``top_bigram_n``   its occurrence count (0 if < 2 tokens)
      - ``top_bigram_frac`` min(2*top_bigram_n/n_tokens, 1) — the token
                           fraction attributable to the dominant bigram
                           (clamped: overlapping occurrences of a
                           single-token run like "a a a a" would
                           otherwise double-count past 1.0)

    Scale shape: the distinct-token fraction is pure map-only Column
    algebra; the dominant-bigram statistic explodes bigrams and
    aggregates keyed by (doc, bigram) then (doc) — both shuffles are
    keyed per document, so the work distributes across the corpus with
    no global hot key.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks__")).withColumn(
        "n_tokens", F.size("__toks__")
    )
    mapped = base.withColumn(
        "dup_token_frac",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                1.0 - F.size(F.array_distinct("__toks__")) / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )
    bigrams = F.transform(
        F.slice(F.col("__toks__"), 1, F.size("__toks__") - 1),
        lambda t, i: F.concat_ws(" ", t, F.element_at(F.col("__toks__"), i + 2)),
    )
    counts = (
        base.where(F.col("n_tokens") >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("top_bigram_n"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("top_bigram_n"), F.asc("bigram"))
    top = (
        counts.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select(F.col(id_col), F.col("bigram").alias("top_bigram"), "top_bigram_n")
    )
    out = mapped.join(top, id_col, "left").select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        "top_bigram",
        F.coalesce(F.col("top_bigram_n"), F.lit(0)).alias("top_bigram_n"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.least(
                    2.0
                    * F.coalesce(F.col("top_bigram_n"), F.lit(0))
                    / F.col("n_tokens"),
                    F.lit(1.0),
                ),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
    )
    return out


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)`` — the standard smoothed-idf form),
    deterministic ties broken by term. Useful for corpus keyword
    profiling / topic sketching in a training-data pipeline.

    Scale shape: one explode + groupBy(doc, term) for term frequencies,
    one groupBy(term) for document frequencies (vocabulary-sized, tiny
    relative to the corpus — AQE picks broadcast when it fits), one
    per-document window for top-k. The corpus size N enters as a
    1-row aggregate crossJoin, not a driver collect.

    Output: (id_col, rank 1..k, term, tf, df, score rounded to 6).
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.agg(F.count("*").alias("__n__"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n__") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(id_col, "rank", "term", "tf", "df", "score")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. Cross-engine reproducible
    (md5 is standardized; the rolling-hash variant in streaming dedup
    literature has no portable SQL form)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def fingerprint_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint(F.col(text_col)))


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap_chars: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-width character windows with overlap —
    the standard pre-tokenization chunking step of a training-data
    pipeline. Pure Column algebra: ``sequence`` generates chunk starts,
    ``posexplode`` emits one row per chunk, ``substring`` slices — all
    JVM-side, map-only, no shuffle, so it runs at corpus scale as a
    projection. Deterministic → exact SQL oracle.

    Output: (id, chunk_idx, chunk_text, chunk_len); every document emits
    at least one chunk (empty text → one empty chunk).
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be smaller than chunk_chars")
    stride = chunk_chars - overlap_chars
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            (F.length(F.col(text_col)) - F.lit(overlap_chars + 1)) / F.lit(stride),
            F.lit(0),
        ).cast("int"),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "__start__"),
            F.col(text_col),
        )
        .select(
            id_col,
            "chunk_idx",
            F.substring(
                F.col(text_col), F.col("__start__") * stride + 1, chunk_chars
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def deterministic_sample(
    df: DataFrame,
    percent: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Reproducible corpus sampling: keep a row iff the md5 of its id
    (+salt) falls under the cut. Unlike ``DataFrame.sample`` this is
    stable across runs, partitionings, and engines (exact SQL oracle),
    and composable — different salts give independent samples for train/
    validation splits. Map-only, no shuffle, no RNG state.
    """
    if not 0 <= percent <= 100:
        raise ValueError("percent must be in [0, 100]")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long") % 10_000
    return df.where(bucket < int(percent * 100))


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Corpus-unigram language-model quality score per document — the
    vocabulary-free cousin of the CCNet/KenLM perplexity filter used by
    the public pre-training pipelines: documents whose tokens are
    atypical for the corpus score low (junk, boilerplate, other
    languages), typical prose scores high.

    Model: add-``alpha`` smoothed unigram LM fit on the corpus itself —
    P(t) = (count(t) + alpha) / (N + alpha * V) — and each document's
    score is its mean token log-probability (natural log; exp(-score)
    is the perplexity).

    Scale shape: everything past the explode works on DISTINCT
    (doc, token) pairs, not token occurrences — one (id, tok) count
    shuffle whose exchange is REUSED by both the term-frequency branch
    and the scoring join (same subplan, Spark's exchange reuse), so the
    corpus tokenizes once and the token-keyed join moves doc-term rows
    (typically several times fewer than occurrences; repetitive docs
    collapse the most). The per-doc score is the count-weighted mean —
    identical values to the per-occurrence mean. Heavy-hitter tokens
    are single hot keys the AQE skew handler splits. O(total tokens)
    with no doc×doc or vocabulary×doc work; all Column algebra, fully
    JVM-side.

    Output: (id_col, n_tokens, avg_logprob) — one row per document with
    at least one token.
    """
    # The explicit NULL filters make the three consumers' subtrees
    # CANONICALLY IDENTICAL so Spark's ReuseExchange actually fires:
    # without them, the scoring join infers isnotnull(id)/isnotnull(tok)
    # on its dtc branch only, the freq/totals branches stay unfiltered,
    # and the corpus tokenizes THREE times (three Generate chains, zero
    # ReusedExchange in the plan — guide §2.4). The tok filter is a
    # no-op (explode(tokens(...)) never yields NULL). The id filter
    # makes the former inferred-filter behavior uniform: NULL-id rows —
    # which never received a score — now also stay out of the corpus
    # frequency model instead of feeding it silently.
    ex = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok").isNotNull())
    dtc = ex.groupBy(id_col, "tok").agg(F.count("*").alias("__c__"))
    freq = dtc.groupBy("tok").agg(F.sum("__c__").alias("__cnt__"))
    totals = freq.agg(
        F.sum("__cnt__").cast("double").alias("__n__"),
        F.count("*").cast("double").alias("__v__"),
    )
    lp = F.log(
        (F.col("__cnt__") + F.lit(float(alpha)))
        / (F.col("__n__") + F.lit(float(alpha)) * F.col("__v__"))
    )
    return (
        dtc.join(freq, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("__c__").cast("long").alias("n_tokens"),
            (F.sum(F.col("__c__") * lp) / F.sum("__c__")).alias("avg_logprob"),
        )
    )
