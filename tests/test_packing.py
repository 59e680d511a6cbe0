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


# ---------------------------------------------------------------- spans


def test_duplicated_spans_finds_shared_passage(spark):
    from modelardb_rs_spark.operators.spans import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    shared = "alpha beta gamma delta epsilon"  # 5 tokens
    docs = spark.createDataFrame(
        [
            (1, f"unique one two {shared} tail1 tail2"),
            (2, f"other words {shared} closing remark here"),
            (3, "entirely different text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, span=5, min_dups=2).collect()
    }
    # doc1: shared occupies tokens 3..8; doc2: tokens 2..7
    assert spans == {1: (3, 8), 2: (2, 7)}

    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, span=5, min_dups=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["text"] == "unique one two tail1 tail2"
    assert out[2]["text"] == "other words closing remark here"
    assert out[3]["n_tokens_removed"] == 0
    assert out[1]["n_tokens_removed"] == 5


def test_duplicated_spans_merge_overlaps(spark):
    """Two overlapping duplicated grams merge into ONE span; repeats
    WITHIN a single document don't count toward min_dups (distinct-doc
    threshold)."""
    from modelardb_rs_spark.operators.spans import duplicated_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x a b c d e y z"),   # shares grams (a b c d) and (b c d e)
            (3, "p q r p q r p q"),   # self-repeats only
        ],
        "doc_id long, text string",
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(docs, span=4, min_dups=2).collect()
    }
    # doc1 tokens 0..5 (a..e), doc2 tokens 1..6 — one merged span each
    assert spans == {(1, 0, 5), (2, 1, 6)}


# ------------------------------------------------------- interval join


def test_interval_join_matches_naive(spark):
    """Bucketized interval join == the O(n*m) theta join, for every
    bucket width; pairs sharing several buckets emit exactly once."""
    import random

    from modelardb_rs_spark.operators.interval import interval_join

    rng = random.Random(7)
    lrows = [(i, rng.randrange(0, 1000), 0) for i in range(60)]
    lrows = [(i, s, s + rng.randrange(1, 300)) for i, s, _ in lrows]
    rrows = [(100 + i, rng.randrange(0, 1000), 0) for i in range(60)]
    rrows = [(i, s, s + rng.randrange(1, 300)) for i, s, _ in rrows]
    left = spark.createDataFrame(lrows, "lid long, start_us long, end_us long")
    right = spark.createDataFrame(rrows, "rid long, start_us long, end_us long")

    naive = {
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] < r[2] and r[1] < l[2]
    }
    for width in (7, 64, 250, 5000):
        got = {
            (r["lid"], r["rid"])
            for r in interval_join(left, right, width).collect()
        }
        assert got == naive, f"width={width}"
    # exactly-once: row COUNT equals pair count (no dedup hidden)
    assert interval_join(left, right, 64).count() == len(naive)


def test_interval_join_extra_keys_and_half_open(spark):
    from modelardb_rs_spark.operators.interval import interval_join

    left = spark.createDataFrame(
        [(1, "a", 0, 10), (2, "b", 0, 10)], "lid long, k string, start_us long, end_us long"
    )
    right = spark.createDataFrame(
        [(3, "a", 5, 15), (4, "b", 10, 20)], "rid long, k string, start_us long, end_us long"
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, 4, extra_on=["k"]).collect()
    }
    # (1,3) overlap with same key; (2,4) touch at 10 — half-open, no overlap
    assert got == {(1, 3)}


def test_interval_join_plans_a_hash_join(spark):
    """The bucketized join must plan as a hash equi-join on the bucket
    key — never BroadcastNestedLoopJoin/CartesianProduct, the O(n*m)
    trap a raw range predicate produces."""
    from modelardb_rs_spark.operators.interval import interval_join

    left = spark.range(1000).selectExpr(
        "id AS lid", "id * 100 AS start_us", "id * 100 + 250 AS end_us"
    )
    right = spark.range(1000).selectExpr(
        "id + 5000 AS rid", "id * 90 AS start_us", "id * 90 + 400 AS end_us"
    )
    plan = (
        interval_join(left, right, 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan


def test_export_training_shards_layout_and_order(spark, tmp_path):
    """The exported layout is what a trainer streams: one parquet file
    per shard directory, rows PHYSICALLY ordered by seq_id inside it
    (verified by reading the file back WITHOUT Spark), shards are
    contiguous near-equal slices of the global sequence order, and the
    read-back manifest matches an independent recomputation."""
    import glob

    import pyarrow.parquet as pq_

    from modelardb_rs_spark.operators.packing import export_training_shards

    n_seq = 13
    seqs = spark.range(n_seq).select(
        F.col("id").alias("seq_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: (F.col("id") * 10 + i).cast("int"),
        ).alias("token_ids"),
        F.lit(5).alias("seq_len"),
    )
    out = str(tmp_path / "shards")
    manifest = {
        r["shard"]: r for r in export_training_shards(seqs, out, 4).collect()
    }
    assert set(manifest) == {0, 1, 2, 3}
    # contiguous split: sizes differ by <=1, ranges abut, union is all
    sizes = [manifest[s]["n_sequences"] for s in range(4)]
    assert sum(sizes) == n_seq and max(sizes) - min(sizes) <= 1
    assert manifest[0]["first_seq_id"] == 0
    assert manifest[3]["last_seq_id"] == n_seq - 1
    for s in range(3):
        assert manifest[s + 1]["first_seq_id"] == manifest[s]["last_seq_id"] + 1
    # one file per shard dir; physical row order inside it is seq order
    for s in range(4):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, f"shard {s}: {files}"
        tbl = pq_.read_table(files[0])
        ids = tbl.column("seq_id").to_pylist()
        assert ids == sorted(ids)
        assert ids[0] == manifest[s]["first_seq_id"]
        assert ids[-1] == manifest[s]["last_seq_id"]
        toks = tbl.column("token_ids").to_pylist()
        assert toks[0] == [ids[0] * 10 + i for i in range(5)]
    assert manifest[0]["n_tokens"] == sizes[0] * 5


def test_export_training_shards_multi_file(spark, tmp_path):
    """rows_per_file decouples file size from the dataloader's W: each
    shard splits into file_seq=0,1,... directories of at most
    rows_per_file sequences, each written by its own task; files tile
    the shard contiguously (cross-file order verified WITHOUT Spark by
    concatenating the physical files in file_seq order), and the
    manifest is keyed (shard, file_seq) with per-file digests."""
    import glob

    import pyarrow.parquet as pq_

    from modelardb_rs_spark.operators.packing import export_training_shards

    n_seq = 23
    seqs = spark.range(n_seq).select(
        F.col("id").alias("seq_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: (F.col("id") * 10 + i).cast("int"),
        ).alias("token_ids"),
        F.lit(5).alias("seq_len"),
    )
    out = str(tmp_path / "mfshards")
    man = export_training_shards(seqs, out, 3, rows_per_file=3).collect()
    by_key = {(r["shard"], r["file_seq"]): r for r in man}
    assert sum(r["n_sequences"] for r in man) == n_seq
    assert all(r["n_sequences"] <= 3 for r in man)
    # shard 0 holds ceil-split slice [0, 8): 8 seqs -> 3 files of 3/3/2
    assert [by_key[(0, f)]["n_sequences"] for f in range(3)] == [3, 3, 2]
    for s in range(3):
        fseqs = sorted(f for sh, f in by_key if sh == s)
        assert fseqs == list(range(len(fseqs)))  # no gaps
        # files tile the shard: ranges abut in file_seq order, and the
        # physical concatenation (read back via pyarrow, no Spark) is
        # the shard's ascending seq stream
        concat = []
        for f in fseqs:
            if f:
                assert (
                    by_key[(s, f)]["first_seq_id"]
                    == by_key[(s, f - 1)]["last_seq_id"] + 1
                )
            files = glob.glob(f"{out}/shard={s}/file_seq={f}/*.parquet")
            assert len(files) == 1, f"(shard {s}, file {f}): {files}"
            concat.extend(pq_.read_table(files[0]).column("seq_id").to_pylist())
        assert concat == sorted(concat)
        assert concat[0] == by_key[(s, 0)]["first_seq_id"]
    # same data, same split -> per-file digest equals a single-file
    # export of just that slice (digest is layout-independent content)
    out2 = str(tmp_path / "sfshards")
    man2 = {
        r["shard"]: r for r in export_training_shards(seqs, out2, 3).collect()
    }
    for s in range(3):
        n_in_shard = sum(r["n_sequences"] for (sh, _), r in by_key.items() if sh == s)
        assert man2[s]["n_sequences"] == n_in_shard


def test_export_training_shards_clamps_to_sequence_count(spark, tmp_path):
    """n_shards > n_sequences must not leave missing shard directories
    (a reader iterating shard=0..W-1 would fail on the gaps): shards
    clamp to the sequence count, one sequence per shard."""
    import glob

    from modelardb_rs_spark.operators.packing import export_training_shards

    seqs = spark.range(3).select(
        F.col("id").alias("seq_id"),
        F.array(F.lit(7)).alias("token_ids"),
        F.lit(1).alias("seq_len"),
    )
    out = str(tmp_path / "clamped")
    man = export_training_shards(seqs, out, 8).orderBy("shard").collect()
    assert [r["shard"] for r in man] == [0, 1, 2]
    assert all(r["n_sequences"] == 1 for r in man)
    assert sorted(glob.glob(f"{out}/shard=*")) == [
        f"{out}/shard={s}" for s in range(3)
    ]


def test_export_training_shards_rejects_bad_input(spark, tmp_path):
    from modelardb_rs_spark.operators.packing import export_training_shards

    seqs = spark.range(3).select(
        F.col("id").alias("seq_id"),
        F.array(F.lit(1)).alias("token_ids"),
        F.lit(1).alias("seq_len"),
    )
    with pytest.raises(ValueError, match="n_shards"):
        export_training_shards(seqs, str(tmp_path / "x"), 0)
    with pytest.raises(ValueError, match="no sequences"):
        export_training_shards(seqs.where("seq_id < 0"), str(tmp_path / "y"), 2)


def test_pack_documents_property(spark):
    """Property check across random corpora: every full sequence holds
    exactly seq_len tokens, every doc's slices cover it exactly once and
    contiguously, and the result matches the sequential reference."""
    import random

    rng = random.Random(42)
    for trial in range(5):
        L = rng.choice([1, 3, 8, 64])
        counts = {
            i: rng.choice([0, 1, L - 1 if L > 1 else 1, L, L + 1, 5 * L + 3])
            for i in range(rng.randrange(1, 40))
        }
        df = spark.createDataFrame(
            [(i, n) for i, n in counts.items()], "doc_id long, n_tok long"
        )
        got = sorted(
            map(tuple, pack_documents(df, L, token_count_col="n_tok").collect())
        )
        assert got == _reference_pack(counts, L), f"trial={trial} L={L} {counts}"


def test_export_uses_driver_known_sequence_count(spark, tmp_path):
    """pack_documents stashes the driver-known sequence count on its
    output; materialize_sequences propagates it; export_training_shards
    reads it instead of re-executing the span chain for max(seq_id) —
    and the exported manifest is identical either way."""
    from modelardb_rs_spark.operators.packing import (
        export_training_shards,
        materialize_sequences,
    )

    docs = spark.range(9).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 4) + 2),
            lambda i: (F.col("id") * 100 + i).cast("int"),
        ).alias("token_ids"),
    )
    counted = docs.withColumn("n_tok", F.size("token_ids").cast("long"))
    packed = pack_documents(counted, 7, id_col="doc_id", token_count_col="n_tok")
    assert isinstance(getattr(packed, "n_sequences", None), int)
    seqs = materialize_sequences(packed, docs, id_col="doc_id")
    n_attr = getattr(seqs, "n_sequences", None)
    assert n_attr == packed.n_sequences
    # the attribute equals the aggregate-derived count
    assert n_attr == seqs.agg(F.max("seq_id")).first()[0] + 1
    out_a = str(tmp_path / "with_attr")
    man_a = sorted(
        tuple(r) for r in export_training_shards(seqs, out_a, 3, rows_per_file=2).collect()
    )
    # strip the attribute (what any post-transformation frame looks
    # like) -> the fallback aggregate path must produce the same export
    seqs_plain = seqs.select("seq_id", "token_ids", "seq_len")
    assert getattr(seqs_plain, "n_sequences", None) is None
    out_b = str(tmp_path / "without_attr")
    man_b = sorted(
        tuple(r) for r in export_training_shards(seqs_plain, out_b, 3, rows_per_file=2).collect()
    )
    assert man_a == man_b
