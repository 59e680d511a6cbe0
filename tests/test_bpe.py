"""Byte-level BPE tokenizer (operators/bpe.py): deterministic training,
fast/reference encoder agreement, losslessness over arbitrary unicode,
and exact-token packing integration."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from modelardb_rs_spark.operators import bpe
from modelardb_rs_spark.sources.testdata import load_table


def test_pretokenizer_is_lossless():
    for s in [
        "hello world",
        "it's Bob's, isn't it?  yes!!",
        "naïve café — 你好世界 🎉🎊",
        "tabs\tand\nnewlines\r\n  mixed   spaces",
        "snake_case __dunder__ x__y",
        "3.14159 2e10 0xFF 1,000,000",
        "",
        " ",
        "   leading and trailing   ",
        "\x00\x1f control bytes",
    ]:
        assert "".join(bpe.PRETOKEN_RE.findall(s)) == s


def test_bytes_to_unicode_bijective_printable():
    m = bpe.bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # every symbol is a single printable non-whitespace char (merge
    # tuples stay unambiguous when concatenated)
    assert all(len(u) == 1 and not u.isspace() for u in m.values())


def test_trainer_deterministic_and_learns_expected_merges():
    corpus = ["low lower lowest", "low low low", "newer newest new"] * 5
    m1 = bpe.train_bpe(corpus, n_merges=50)
    m2 = bpe.train_bpe(list(corpus), n_merges=50)
    assert m1 == m2 and len(m1) > 0
    tok = bpe.BPETokenizer(m1)
    # 'low' occurs 9x: after enough merges it must be a single token
    ids = tok.encode("low")
    assert len(ids) == 1
    assert tok.decode(ids) == "low"


def test_distributed_trainer_matches_local(spark):
    """train_bpe_on_corpus (Arrow map + groupBy count, driver sees only
    the distinct-piece table) must produce the identical merge list as
    the in-memory trainer on the same corpus."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    local = bpe.train_bpe(texts, n_merges=200)
    dist = bpe.train_bpe_on_corpus(docs, n_merges=200)
    assert dist == local and len(dist) > 50


def test_sampled_trainer_deterministic_and_converges(spark):
    """sample_fraction: seeded hash-deterministic corpus sampling ahead
    of the frequency pass — two runs are byte-identical, fraction 1.0
    equals the full fit by construction, and a modest fraction
    reproduces the full fit's EARLY merges (zipfian head frequencies
    scale, order holds — the SCALE.md sampled-piece-table recipe)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = bpe.train_bpe_on_corpus(docs, n_merges=120)
    s1 = bpe.train_bpe_on_corpus(docs, n_merges=120, sample_fraction=0.5, seed=7)
    s2 = bpe.train_bpe_on_corpus(docs, n_merges=120, sample_fraction=0.5, seed=7)
    assert s1 == s2 and len(s1) > 50
    assert bpe.train_bpe_on_corpus(docs, n_merges=120, sample_fraction=1.0) == full
    # the early merge SET largely survives 2x downsampling even on this
    # tiny fixture (exact order flips where thinned counts tie —
    # SCALE.md "Round-10" measures the overlap at realistic scale)
    overlap = len(set(s1[:40]) & set(full[:40])) / 40
    assert overlap >= 0.6, f"early-merge overlap {overlap}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sample_fraction"):
        bpe.train_bpe_on_corpus(docs, n_merges=10, sample_fraction=0.0)


def test_fast_matches_reference_on_corpus(spark):
    merges = bpe.BPETokenizer.default().merges
    tok = bpe.BPETokenizer(merges)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for (text,) in docs.select("text").limit(25).collect():
        assert tok.encode(text) == bpe.reference_encode(text, merges)
        assert tok.decode(tok.encode(text)) == text


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=120))
def test_roundtrip_and_reference_agreement_any_unicode(s):
    tok = _default_tok()
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    assert ids == bpe.reference_encode(s, tok.merges)
    assert all(0 <= i < tok.vocab_size for i in ids)


def _default_tok():
    # one shared instance across hypothesis examples (piece cache warm)
    global _TOK
    try:
        return _TOK
    except NameError:
        _TOK = bpe.BPETokenizer.default()
        return _TOK


def test_token_ids_layout():
    tok = bpe.BPETokenizer.default()
    assert tok.vocab_size == 256 + len(tok.merges)
    # base ids are byte values: encoding a piece with no applicable
    # merges yields its raw bytes
    assert tok.encode("\x00") == [0]


def test_spark_encode_matches_pins(spark):
    """The Arrow-batched encoder agrees with the reference-encoder pins
    (resources/bpe_pins.py) on every sf0.01 document — count, exact id
    sequence (md5), and roundtrip."""
    from modelardb_rs_spark.resources.bpe_pins import PINS

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = bpe.encode_documents(docs).select(
        "doc_id",
        F.size("bpe_ids").alias("n"),
        bpe.token_ids_hash(F.col("bpe_ids")).alias("h"),
        (bpe.bpe_decode_udf()(F.col("bpe_ids")) == F.col("text")).alias("ok"),
    )
    got = {r["doc_id"]: (r["n"], r["h"], r["ok"]) for r in out.collect()}
    assert len(got) == len(PINS)
    for doc_id, n, h in PINS:
        assert got[doc_id] == (n, h, True)


def test_sql_surface(spark, engine):
    """bpe_count / bpe_encode / bpe_decode are session SQL UDFs (Engine
    init registers them) and agree with the Column API."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("bpe_docs")
    row = engine.read_sql(
        "SELECT sum(bpe_count(text)) AS total, "
        "sum(CASE WHEN bpe_decode(bpe_encode(text)) = text THEN 1 ELSE 0 END) AS ok, "
        "count(*) AS n FROM bpe_docs"
    ).collect()[0]
    api_total = (
        bpe.exact_token_counts(docs).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    assert row["total"] == api_total
    assert row["ok"] == row["n"] == docs.count()


def test_materialize_sequences_reassembles_exact_ids(spark):
    """materialize_sequences: concatenating every sequence back in
    seq_id order must reproduce the exact token stream of the packed
    documents in pack order — no token lost, duplicated, or reordered;
    every sequence but the last is exactly full."""
    from modelardb_rs_spark.operators.packing import (
        materialize_sequences,
        pack_documents,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    enc = bpe.encode_documents(docs).select(
        "doc_id", F.col("bpe_ids").alias("token_ids")
    )
    counted = enc.withColumn("n", F.size("token_ids"))
    packed = pack_documents(counted, 128, id_col="doc_id", token_count_col="n")
    seqs = materialize_sequences(packed, enc).orderBy("seq_id").collect()
    stream = [i for r in seqs for i in r["token_ids"]]
    expected = [
        i
        for r in counted.orderBy("doc_id").collect()
        for i in r["token_ids"]
    ]
    assert stream == expected
    assert all(r["seq_len"] == 128 for r in seqs[:-1])
    assert 0 < seqs[-1]["seq_len"] <= 128


def test_pack_documents_on_exact_bpe_counts(spark):
    """Tokenizer-faithful packing: pack_documents driven by exact BPE
    counts gives per-document spans that sum to the document's REAL
    token count, and every full sequence holds exactly 256 tokens."""
    from modelardb_rs_spark.operators.packing import pack_documents

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    counted = bpe.exact_token_counts(docs)
    expected = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in counted.select("doc_id", "n_bpe_tokens").collect()
    }
    packed = pack_documents(
        counted, 256, id_col="doc_id", token_count_col="n_bpe_tokens"
    )
    rows = packed.collect()
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
        assert r["doc_token_end"] - r["doc_token_start"] == r["n_tokens"]
    assert per_doc == {d: n for d, n in expected.items() if n > 0}
    # sequences are exactly full except possibly the last one
    seq_fill = {}
    for r in rows:
        seq_fill[r["seq_id"]] = seq_fill.get(r["seq_id"], 0) + r["n_tokens"]
    last = max(seq_fill)
    assert all(v == 256 for s, v in seq_fill.items() if s != last)
