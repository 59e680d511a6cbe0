"""Sequence packing (concat-and-chunk) and stratified sampling."""

import pytest
from pyspark.sql import functions as F

from modelardb_rs_spark.operators.packing import pack_documents, stratified_sample


def _reference_pack(counts: dict[int, int], L: int):
    """Driver-side reference: lay docs end-to-end ascending id, cut at L."""
    rows = []
    start = 0
    for doc_id in sorted(counts):
        n = counts[doc_id]
        if n <= 0:
            continue
        for seq in range(start // L, (start + n - 1) // L + 1):
            lo = max(seq * L, start)
            hi = min((seq + 1) * L, start + n)
            rows.append((doc_id, seq, lo - start, hi - start, lo - seq * L, hi - lo))
        start += n
    return sorted(rows)


@pytest.fixture()
def counted(spark):
    counts = {1: 4, 2: 10, 3: 7, 4: 25, 5: 3, 6: 0, 7: 1}
    df = spark.createDataFrame(
        [(i, n) for i, n in counts.items()], "doc_id long, n_tok long"
    )
    return df, counts


def test_pack_documents_matches_reference(spark, counted):
    df, counts = counted
    out = sorted(
        map(tuple, pack_documents(df, 10, token_count_col="n_tok").collect())
    )
    assert out == _reference_pack(counts, 10)
    # invariants: every full sequence holds exactly seq_len tokens and
    # every doc's slices cover it exactly once
    packed = pack_documents(df, 10, token_count_col="n_tok")
    per_seq = {r["seq_id"]: r["t"] for r in packed.groupBy("seq_id").agg(F.sum("n_tokens").alias("t")).collect()}
    total = sum(n for n in counts.values() if n > 0)
    for seq, t in per_seq.items():
        assert t == 10 or seq == max(per_seq)
    per_doc = {r["doc_id"]: r["t"] for r in packed.groupBy("doc_id").agg(F.sum("n_tokens").alias("t")).collect()}
    assert per_doc == {i: n for i, n in counts.items() if n > 0}
    assert sum(per_seq.values()) == total


def test_pack_documents_stable_across_partitionings(spark, counted):
    df, counts = counted
    a = sorted(map(tuple, pack_documents(df, 8, token_count_col="n_tok").collect()))
    b = sorted(
        map(
            tuple,
            pack_documents(
                df.repartition(7), 8, token_count_col="n_tok", num_partitions=3
            ).collect(),
        )
    )
    assert a == b == _reference_pack(counts, 8)


def test_pack_documents_from_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "d e f g h")], "doc_id long, text string"
    )
    out = sorted(map(tuple, pack_documents(df, 4).collect()))
    assert out == _reference_pack({1: 3, 2: 0, 3: 5}, 4)


def test_pack_documents_rejects_bad_seq_len(spark, counted):
    df, _ = counted
    with pytest.raises(ValueError, match="seq_len"):
        pack_documents(df, 0, token_count_col="n_tok")


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, ["en", "code", "other"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, {"en": 0.5, "code": 1.0}, "lang")
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en", "code"}  # default_rate=0 drops 'other'
    n_code = kept.where(F.col("lang") == "code").count()
    assert n_code == 1000  # rate 1.0 keeps everything
    n_en = kept.where(F.col("lang") == "en").count()
    assert 380 <= n_en <= 620  # ~50% of 1000, hash-uniform
    again = stratified_sample(df, {"en": 0.5, "code": 1.0}, "lang")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, kept.collect()))
    # a different salt gives an independent (different) sample
    other = stratified_sample(df, {"en": 0.5, "code": 1.0}, "lang", salt="x")
    assert sorted(map(tuple, other.collect())) != sorted(map(tuple, kept.collect()))
