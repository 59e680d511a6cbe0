"""Corpus quality filtering — the composed gate of a pre-training
pipeline.

Every public pipeline (C4, CCNet, Gopher/MassiveText, RefinedWeb,
Dolma) ends its per-document stage with the same shape: compute cheap
signals, apply thresholds, keep what survives, and report WHY each
dropped document died (the reason histogram is what a pipeline owner
actually tunes against). This module composes the engine's existing
per-document operators — token stats, quality score, language id, PII
counts, repetition, unigram-LM score — into one declarative policy:

    policy = FilterPolicy(min_tokens=50, languages=("en",), max_pii=0)
    kept = filter_corpus(docs, policy)          # surviving rows
    stats = rejection_stats(docs, policy)       # (reason, n_docs)

Scale shape: the signals are map-only Column algebra except the
unigram-LM score (two token-keyed shuffles, O(total tokens)); the
policy itself adds nothing but a filter. A rejected doc is counted
under EVERY rule it violates, so the histogram answers "what would
relaxing this rule recover" directly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from modelardb_rs_spark.operators import pii as pii_ops
from modelardb_rs_spark.operators import text as text_ops


@dataclass(frozen=True)
class FilterPolicy:
    """Thresholds of the quality gate; None disables a rule."""

    min_tokens: int | None = None
    max_tokens: int | None = None
    min_quality: float | None = None  # composite score in [0, 1]
    languages: tuple[str, ...] | None = None  # predicted-language allowlist
    max_pii: int | None = None  # max PII spans per doc
    min_logprob: float | None = None  # corpus-unigram LM floor


def _signals(
    df: DataFrame, policy: FilterPolicy, text_col: str, id_col: str
) -> DataFrame:
    # Every per-document signal is a pure Column expression over the
    # text — computed IN PLACE, never joined back by id. (An id join
    # here shuffles the full text once per enabled rule: measured 30x
    # wall at 4M docs before this change — scale_probe_docs N=800.)
    # Only the unigram-LM floor genuinely needs corpus state (token
    # frequencies), so only it joins.
    out = df
    c = F.col(text_col)
    if policy.min_tokens is not None or policy.max_tokens is not None:
        out = out.withColumn("__n_tok__", text_ops.token_count(c))
    if policy.min_quality is not None:
        out = out.withColumn("__q__", text_ops.quality_score(c))
    if policy.languages is not None:
        out = out.withColumn("__lang__", text_ops.language_pred(c))
    if policy.max_pii is not None:
        out = out.withColumn("__pii__", pii_ops.pii_total(c))
    if policy.min_logprob is not None:
        lm = text_ops.unigram_lm_scores(df, text_col, id_col).select(
            F.col(id_col), F.col("avg_logprob").alias("__lp__")
        )
        # docs with no tokens have no LM row: they fail the floor
        out = out.join(lm, id_col, "left")
    return out


def _violations(policy: FilterPolicy) -> list[tuple[str, Column]]:
    rules: list[tuple[str, Column]] = []
    if policy.min_tokens is not None:
        rules.append(("too_few_tokens", F.col("__n_tok__") < policy.min_tokens))
    if policy.max_tokens is not None:
        rules.append(("too_many_tokens", F.col("__n_tok__") > policy.max_tokens))
    if policy.min_quality is not None:
        rules.append(("low_quality", F.col("__q__") < policy.min_quality))
    if policy.languages is not None:
        rules.append(("wrong_language", ~F.col("__lang__").isin(*policy.languages)))
    if policy.max_pii is not None:
        rules.append(("pii", F.col("__pii__") > policy.max_pii))
    if policy.min_logprob is not None:
        rules.append(
            ("low_logprob",
             F.col("__lp__").isNull() | (F.col("__lp__") < policy.min_logprob))
        )
    return rules


def filter_corpus(
    df: DataFrame,
    policy: FilterPolicy,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The rows of ``df`` that pass every enabled rule (original schema)."""
    sig = _signals(df, policy, text_col, id_col)
    keep = F.lit(True)
    for _, bad in _violations(policy):
        keep = keep & ~F.coalesce(bad, F.lit(False))
    return sig.where(keep).select(*df.columns)


def rejection_stats(
    df: DataFrame,
    policy: FilterPolicy,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(reason, n_docs) for every enabled rule, plus 'kept' and 'total'.
    A document violating several rules counts under each (the histogram
    answers "what would relaxing this rule recover")."""
    sig = _signals(df, policy, text_col, id_col)
    rules = _violations(policy)
    aggs = [
        F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias(reason)
        for reason, bad in rules
    ]
    keep = F.lit(True)
    for _, bad in rules:
        keep = keep & ~F.coalesce(bad, F.lit(False))
    aggs.append(F.sum(keep.cast("long")).alias("kept"))
    aggs.append(F.count("*").alias("total"))
    wide = sig.agg(*aggs)
    names = [reason for reason, _ in rules] + ["kept", "total"]
    pairs = F.array(
        *[F.struct(F.lit(n).alias("reason"), F.col(n).alias("n_docs")) for n in names]
    )
    return wide.select(F.explode(pairs).alias("r")).select("r.reason", "r.n_docs")
