"""PII detection/redaction and corpus line-dedup operators."""

import duckdb
import pytest

from pyspark.sql import functions as F

from modelardb_rs_spark.operators import lines as line_ops
from modelardb_rs_spark.operators import pii as pii_ops

DOCS = [
    (1, "Contact me at alice@example.com or 555-123-4567.\nThanks!"),
    (2, "Server at 10.0.0.1 logged SSN 123-45-6789 twice: 123-45-6789."),
    (3, "No sensitive content here, just 3.14 and v1.2.3.4 strings."),
    (4, "bob.smith+spam@mail.co and carol@sub.domain.org emailed."),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pii_counts(docs):
    rows = {r["doc_id"]: r.asDict() for r in pii_ops.pii_counts(docs).collect()}
    assert rows[1] == {"doc_id": 1, "n_email": 1, "n_ssn": 0, "n_phone": 1, "n_ipv4": 0, "n_pii": 2}
    assert rows[2]["n_ssn"] == 2
    assert rows[2]["n_ipv4"] == 1
    # 3-2-4 digit grouping is SSN, not phone (3-3-4)
    assert rows[2]["n_phone"] == 0
    assert rows[3]["n_pii"] == 0
    assert rows[4]["n_email"] == 2


def test_redact(docs):
    red = {r["doc_id"]: r["text"] for r in pii_ops.redact_documents(docs).collect()}
    assert red[1] == "Contact me at <EMAIL> or <PHONE>.\nThanks!"
    assert red[2].count("<SSN>") == 2 and "<PHONE>" not in red[2]
    assert red[3] == DOCS[2][1]
    assert red[4].count("<EMAIL>") == 2


def test_pii_oracle_parity(docs):
    """The same pattern strings must count identically in DuckDB — this is
    what makes the driver oracle trustworthy."""
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = {
        r[0]: r for r in con.sql(pii_ops.pii_oracle_sql()).fetchall()
    }
    for r in pii_ops.pii_counts(docs).collect():
        assert oracle[r["doc_id"]] == (
            r["doc_id"], r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"], r["n_pii"]
        )


BOILER = [
    (1, "Cookie notice\nReal content one.\n\nCookie   NOTICE\nunique line A"),
    (2, "cookie notice\nReal content two."),
    (3, "Totally original document."),
]


@pytest.fixture()
def boiler(spark):
    return spark.createDataFrame(BOILER, "doc_id long, text string")


def test_common_lines(boiler):
    rows = line_ops.common_lines(boiler, min_docs=2).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["norm"] == "cookie notice"
    assert r["n_docs"] == 2 and r["n_occurrences"] == 3


def test_remove_common_lines_preserves_order_and_blanks(boiler):
    out = {r["doc_id"]: r.asDict() for r in line_ops.remove_common_lines(boiler, min_docs=2).collect()}
    # both spellings removed, blank line kept, order intact
    assert out[1]["text"] == "Real content one.\n\nunique line A"
    assert out[1]["n_lines_removed"] == 2 and out[1]["n_lines_kept"] == 3
    assert out[2]["text"] == "Real content two."
    assert out[3]["text"] == BOILER[2][1]
    assert out[3]["n_lines_removed"] == 0


def test_unigram_lm_scores(spark):
    import math

    from modelardb_rs_spark.operators.text import unigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    # counts: a=3, b=2, c=1; N=6, V=3, alpha=1 -> P(a)=4/9, P(b)=3/9, P(c)=2/9
    exp1 = (2 * math.log(4 / 9) + math.log(3 / 9)) / 3
    exp3 = math.log(2 / 9)
    assert out[1]["n_tokens"] == 3
    assert math.isclose(out[1]["avg_logprob"], exp1, rel_tol=1e-12)
    assert math.isclose(out[3]["avg_logprob"], exp3, rel_tol=1e-12)
    # the all-rare-tokens doc scores lowest
    assert out[3]["avg_logprob"] < out[2]["avg_logprob"] < out[1]["avg_logprob"]


def test_filter_corpus_and_stats(spark):
    from modelardb_rs_spark.operators.filtering import (
        FilterPolicy,
        filter_corpus,
        rejection_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "the and of to is in that a " * 20),          # good english
            (2, "der die und das ist nicht ein mit " * 20),   # german
            (3, "short text"),                                # too few tokens
            (4, "mail me at a@b.com " + "the and of to is a " * 20),  # pii
            (5, ""),                                          # empty: no tokens
        ],
        "doc_id long, text string",
    )
    policy = FilterPolicy(
        min_tokens=20, languages=("en",), max_pii=0, min_logprob=-20.0
    )
    kept = filter_corpus(docs, policy)
    assert [r["doc_id"] for r in kept.orderBy("doc_id").collect()] == [1]
    assert kept.columns == docs.columns
    stats = {r["reason"]: r["n_docs"] for r in rejection_stats(docs, policy).collect()}
    assert stats["total"] == 5 and stats["kept"] == 1
    assert stats["too_few_tokens"] == 2      # docs 3 and 5
    assert stats["wrong_language"] == 3      # doc 2 (de), docs 3 and 5 (und)
    assert stats["pii"] == 1
    assert stats["low_logprob"] == 1         # the empty doc has no LM row

    # quality-score rule path
    q_policy = FilterPolicy(min_quality=0.5)
    qs = {r["reason"]: r["n_docs"] for r in rejection_stats(docs, q_policy).collect()}
    assert qs["kept"] + qs["low_quality"] == 5


def test_minhash_index_roundtrip(engine, spark):
    from modelardb_rs_spark.operators.dedup_index import (
        append_to_minhash_index,
        build_minhash_index,
        near_dup_check,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different content about spark engines " * 6)],
        "doc_id long, text string",
    )
    stats = build_minhash_index(engine, "ndi", corpus)
    assert stats["n_docs"] == 2

    new = spark.createDataFrame(
        [
            (10, base + " tiny tail edit"),       # near-dup of doc 1
            (11, "fresh unrelated text with novel words entirely " * 6),
        ],
        "doc_id long, text string",
    )
    hits = near_dup_check(engine, "ndi", new, min_est_jaccard=0.5).collect()
    assert {(r["doc_id"], r["matched_id"]) for r in hits} == {(10, 1)}
    assert all(r["est_jaccard"] >= 0.5 for r in hits)

    # append the unique one; re-checking it now self-matches
    uniq = new.where(F.col("doc_id") == 11)
    first = append_to_minhash_index(engine, "ndi", uniq, txn=("appender", 1))
    assert first == {"appended": 1, "replayed": False}
    again = near_dup_check(engine, "ndi", uniq, 0.9)
    assert {(r["doc_id"], r["matched_id"]) for r in again.collect()} == {(11, 11)}
    # replaying the same txn is a no-op and must SAY so — not report
    # the input count as appended
    replay = append_to_minhash_index(engine, "ndi", uniq, txn=("appender", 1))
    assert replay == {"appended": 0, "replayed": True}
    still = near_dup_check(engine, "ndi", uniq, 0.9)
    assert still.count() == 1  # one stored copy, not two


def test_minhash_index_check_bucket_cap(engine, spark):
    """near_dup_check(max_bucket=) must skip an oversized STORED bucket
    (boilerplate shared by many stored docs) while a small true-dup
    bucket keeps matching."""
    from modelardb_rs_spark.operators.dedup_index import (
        build_minhash_index,
        near_dup_check,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    boiler = "standard legal disclaimer text repeated verbatim " * 6
    corpus = spark.createDataFrame(
        [(1, base)] + [(100 + i, boiler) for i in range(20)],
        "doc_id long, text string",
    )
    build_minhash_index(engine, "ndi_cap", corpus)
    new = spark.createDataFrame(
        [(10, base + " tiny tail edit"), (11, boiler)],
        "doc_id long, text string",
    )
    uncapped = {
        (r["doc_id"], r["matched_id"])
        for r in near_dup_check(engine, "ndi_cap", new, 0.5).collect()
    }
    assert (10, 1) in uncapped
    assert sum(1 for d, _ in uncapped if d == 11) == 20  # batch x bucket blowup
    capped = {
        (r["doc_id"], r["matched_id"])
        for r in near_dup_check(engine, "ndi_cap", new, 0.5, max_bucket=10).collect()
    }
    assert capped == {(10, 1)}  # boilerplate bucket pruned, true match kept


def test_minhash_index_persists_shingle_sampling(engine, spark):
    """An index built with shingle_keep_mod must persist the mod and use
    it for every later check/append — mixed-scheme signatures would
    silently never match, so the parameter travels with the index."""
    from modelardb_rs_spark.operators.dedup_index import (
        _params,
        append_to_minhash_index,
        build_minhash_index,
        near_dup_check,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different content about spark engines " * 6)],
        "doc_id long, text string",
    )
    build_minhash_index(engine, "ndi_s", corpus, shingle_keep_mod=2)
    assert _params(engine, "ndi_s") == (16, 8, 3, 2)

    new = spark.createDataFrame(
        [(10, base + " tiny tail edit")], "doc_id long, text string"
    )
    hits = near_dup_check(engine, "ndi_s", new, min_est_jaccard=0.5).collect()
    assert {(r["doc_id"], r["matched_id"]) for r in hits} == {(10, 1)}

    # appended docs are hashed under the SAME stored mod: an appended
    # copy of doc 10 must self-match at est_jaccard 1.0
    append_to_minhash_index(engine, "ndi_s", new)
    again = {(r["doc_id"], r["matched_id"]) for r in near_dup_check(engine, "ndi_s", new, 0.99).collect()}
    assert (10, 10) in again


def test_remove_common_lines_keeps_null_text_docs(spark):
    """A document with NULL text must survive as an empty husk — one
    output row per input row, as documented."""
    from modelardb_rs_spark.operators.lines import remove_common_lines

    docs = spark.createDataFrame(
        [(1, "shared footer\nunique a"), (2, "shared footer\nunique b"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_common_lines(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3]["text"] == "" and out[3]["n_lines_kept"] == 1
    assert "shared footer" not in out[1]["text"]
