"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for 100 TB corpora:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on a
  16-byte key; the canonical first pass of every dedup pipeline.
- **n-gram Jaccard**: exact pairwise similarity via a shingle-inverted
  index self-join. Quadratic in the worst case — correct gold standard
  at validation scale; at corpus scale run MinHash+LSH first and use
  this only to verify candidate pairs (which is exactly how
  ``minhash_dedup_pairs`` composes below).
- **MinHash + LSH**: k md5-derived min-hashes per document
  (shuffle: one groupBy over exploded shingles), banded into b buckets;
  candidate pairs = docs sharing a band bucket (equi-join on the band
  key — no all-pairs comparison anywhere). All hashing is md5-based and
  therefore reproducible in any SQL engine for oracle checks.
- **SimHash**: 16-bit signature from per-token hashes; near-duplicates =
  small Hamming distance. Map-only signature computation + one groupBy.

Every function returns a DataFrame and is pure Column algebra (no
Python UDFs), so Catalyst can push filters/prune columns and AQE can
handle skewed shingle keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from modelardb_rs_spark.operators.text import fingerprint, tokens


# --------------------------------------------------------------- exact


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization)
    documents: (fingerprint, n_docs, doc_ids sorted) for groups with >1 doc."""
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def distinct_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per fingerprint."""
    fp = df.withColumn("fingerprint", fingerprint(F.col(text_col)))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return fp.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") == 1).drop("__rn__")


# ------------------------------------------------------------- shingles


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (sorted for
    determinism)."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    # A doc with fewer than n tokens gets its whole text as one shingle.
    grams = F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(grams)
    return F.array_sort(F.array_distinct(grams))


def explode_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    keep_mod: int | None = None,
) -> DataFrame:
    # Shingling is interpreted expression work (regexp split + array HOFs),
    # so spread the docs across cores first: corpora often arrive as a few
    # large unsplittable Parquet row groups that would otherwise pin the
    # whole explode (and both sides of a dedup self-join) to one task.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = shingles(F.col(text_col), n)
    if keep_mod is not None and keep_mod > 1:
        # Consistent sampling INSIDE the array, before the explode:
        # dropped shingles never materialize as rows, so the explode's
        # output, the md5 hashing, and the downstream shuffle all shrink
        # by ~keep_mod x. xxhash64 is a cheap JVM hash independent of
        # the md5 signature scheme.
        sh = F.filter(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(keep_mod)) == 0)
    return df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), F.explode(sh).alias("shingle")
    )


# ------------------------------------------------------- n-gram Jaccard


from modelardb_rs_spark.plans.stats import plan_size_bytes as _plan_size_bytes

# An exploded shingle index is roughly an order of magnitude larger than
# its source text; only hint a broadcast when the *source* is well under
# the executor-memory comfort zone, otherwise let AQE pick the strategy
# from real shuffle statistics at runtime.
_BROADCAST_SOURCE_LIMIT = 32 << 20


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_index: bool | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via a shingle inverted index:
    explode distinct shingles, self-join on shingle (id_a < id_b),
    count the intersection, and compute |A∩B| / (|A|+|B|-|A∩B|).

    Quadratic in co-shingled pairs by nature — this is the gold-standard
    verifier, not the scale path; ``minhash_dedup_pairs`` blocks with LSH
    and verifies candidates in O(|candidates|) instead.

    ``broadcast_index``: True forces a broadcast-hash self-join (skips
    shuffling both exploded sides), False forces shuffle+AQE, and None
    (default) broadcasts only when Catalyst's size estimate of the source
    is small enough that the exploded index safely fits an executor.

    Output: (id_a, id_b, jaccard rounded to 6) with jaccard >= threshold.
    """
    ex = explode_shingles(df, text_col, id_col, n).alias("l")
    # Per-doc shingle counts straight from the array length — no second
    # explode+groupBy pass (and small enough to broadcast into the join).
    sizes = df.select(
        F.col(id_col), F.size(shingles(F.col(text_col), n)).alias("n_shingles")
    )
    if broadcast_index is None:
        broadcast_index = _plan_size_bytes(df) < _BROADCAST_SOURCE_LIMIT
    rhs = explode_shingles(df, text_col, id_col, n).alias("r")
    if broadcast_index:
        rhs = F.broadcast(rhs)
    pairs = (
        ex.join(rhs, F.col("l.shingle") == F.col("r.shingle"))
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_shingles", "na")
    sb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_shingles", "nb")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------- MinHash


def minhash_signatures(
    df: DataFrame,
    k: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_keep_mod: int | None = None,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    ONE md5 per shingle, split into two 28-bit halves, drives all k
    permutations by Kirsch-Mitzenmacher double hashing
    (h_i = (h1 + i*h2) mod 2^31-1 — the public composite-hash result
    from "Less Hashing, Same Performance", ESA 2006): 16x less hashing
    CPU than the previous md5-per-permutation scheme, and BIGINT
    signature elements instead of 32-char hex strings — ~4x narrower
    aggregation state and shuffle. Measured at 4M docs (SCALE.md):
    signatures 357->280s, index build 647->522s; candidate generation
    is unchanged because the shingle explode, not hashing, dominates
    it. Still oracle-reproducible: DuckDB parses the same hex
    prefixes with CAST('0x'||substr(md5(s),..) AS BIGINT) and the
    arithmetic stays inside 2^33 (no overflow in either engine).
    One explode + one groupBy; no pairwise work.

    ``shingle_keep_mod`` (default off) is the opt-in scale lever for
    candidate generation — the dominant measured cost of the 4M-doc
    probe (SCALE.md): keep only shingles whose xxhash64 lands in
    residue class 0 mod N, a CONSISTENT sample (the same shingle
    survives in every document), so MinHash over the sampled sets is
    an unbiased estimate of the sampled-universe Jaccard, which equals
    full Jaccard in expectation. The cut happens before the md5 and
    before the signature groupBy, so hashing CPU and the one
    data-sized shuffle both shrink by ~N×. The trade is RECALL only:
    a doc whose every shingle is sampled out drops from the signature
    frame, and near-threshold pairs jitter — precision is untouched
    because ``verify_candidate_pairs`` always re-checks candidates
    against FULL shingle sets. Measured recall/cost curve: SCALE.md
    "Round-7". The sampled signatures are a different hash scheme than
    the unsampled ones — persisted indexes record it (dedup_index.py).
    """
    ex = explode_shingles(df, text_col, id_col, n, keep_mod=shingle_keep_mod)
    base = F.md5(F.col("shingle"))
    hashed = ex.select(
        F.col(id_col),
        F.conv(F.substring(base, 1, 7), 16, 10).cast("long").alias("__h1__"),
        F.conv(F.substring(base, 8, 7), 16, 10).cast("long").alias("__h2__"),
    )
    P = 2147483647  # 2^31 - 1 (prime)
    aggs = [
        F.min((F.col("__h1__") + F.lit(i) * F.col("__h2__")) % F.lit(P)).alias(f"h{i}")
        for i in range(k)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def band_keys(
    signatures: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_hash) — each signature's banded LSH keys; docs
    sharing any (band, band_hash) are near-dup candidates."""
    sig_cols = [c for c in signatures.columns if c != id_col]
    rows_per_band = len(sig_cols) // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[F.col(sig_cols[b * rows_per_band + r]) for r in range(rows_per_band)]).alias(
                    "band_hash"
                ),
            )
            for b in range(bands)
        ]
    )
    return signatures.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket: int | str | None = None,
    auto_cap_floor: int = 64,
    auto_cap_median_mult: int = 32,
) -> DataFrame:
    """Banded LSH over MinHash signatures: documents sharing any band's
    concatenated hash become a candidate pair. Equi-join on the band
    key — the only shuffle keys are (band, band_hash), so the work is
    proportional to bucket sizes, never all-pairs.

    ``max_bucket`` (default off) skips buckets holding more than that
    many documents before the self-join. A bucket of size s emits
    s*(s-1)/2 pairs, so one degenerate bucket (boilerplate band hash,
    or sampled-signature variance under ``shingle_keep_mod`` — see
    SCALE.md "Round-7", where mod=4 at 4M docs inflated the candidate
    shuffle past 90 GB) can dominate the entire candidate volume while
    contributing almost only false positives: a TRUE near-dup group of
    g docs needs only some bucket of size >= 2 holding each pair, and
    real groups are small, so a cap in the hundreds leaves their
    buckets untouched. The cost is one combiner-friendly count over
    the band keys (narrow rows, partial aggregation map-side); the
    trade is recall of pairs whose EVERY colliding bucket exceeds the
    cap — measured on the probe corpus in SCALE.md "Round-7".

    ``max_bucket="auto"`` sizes the cap FROM THE DATA instead of a
    guessed constant: cap = max(``auto_cap_floor``,
    ``auto_cap_median_mult`` x the MEDIAN bucket size). A true dup
    group of g docs fills buckets of size ~g, and typical buckets sit
    near the median, so a generous multiple of the median spares every
    real group while deleting the quadratic output of degenerate
    buckets — no constant tuned on one corpus. The rule is anchored to
    the distribution's CENTER, not its tail, deliberately: the
    alternative tail rule (cap = p99.9 of bucket sizes) was measured
    at the 4M-doc scale and landed INSIDE the degenerate mass on a
    pathological corpus — 799M candidates vs the median rule's ~95M
    at identical recall (SCALE.md "Round-8"); a quantile guard fails
    exactly when degenerate buckets stop being rare, which is when the
    guard matters. The median is one extra reduction over the SAME
    bucket-size aggregate the cap already computes, broadcast back as
    a one-row frame — no driver collect, no second pass over the
    keys."""
    exploded = band_keys(signatures, bands, id_col)
    if isinstance(max_bucket, str) and max_bucket != "auto":
        # any other string would fall into the numeric branch, cast to
        # NULL under non-ANSI Spark, and silently drop EVERY bucket
        raise ValueError(f"max_bucket must be an int, None, or 'auto', got {max_bucket!r}")
    if max_bucket is not None:
        sizes = exploded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("__bucket_n__")
        )
        if max_bucket == "auto":
            cap_df = sizes.agg(
                F.greatest(
                    F.lit(auto_cap_floor).cast("long"),
                    F.ceil(
                        F.lit(float(auto_cap_median_mult))
                        * F.expr("percentile(__bucket_n__, 0.5)")
                    ),
                ).alias("__cap__")
            )
            exploded = (
                exploded.join(sizes, ["band", "band_hash"])
                .crossJoin(F.broadcast(cap_df))
                .where(F.col("__bucket_n__") <= F.col("__cap__"))
                .drop("__bucket_n__", "__cap__")
            )
        else:
            exploded = (
                exploded.join(sizes, ["band", "band_hash"])
                .where(F.col("__bucket_n__") <= max_bucket)
                .drop("__bucket_n__")
            )
    l, r = exploded.alias("l"), exploded.alias("r")
    return (
        l.join(r, ["band", "band_hash"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def verify_candidate_pairs(
    df: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard for a pre-blocked candidate set, in O(|candidates|).

    Joins the (id_a, id_b) candidates to each side's *shingle array* and
    intersects the two arrays per pair — no inverted-index self-join, so
    the cost is two equi-joins on doc id plus per-pair array math. This is
    the verifier the blocking stage (LSH/SimHash) feeds at corpus scale.

    Output: (id_a, id_b, jaccard rounded to 6) with jaccard >= threshold.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("__sh__")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh__").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh__").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_keep_mod: int | None = None,
) -> DataFrame:
    """The scale pipeline: MinHash → banded LSH candidates → exact
    Jaccard verification of the candidates only (never all-pairs).

    ``shingle_keep_mod`` opts into consistent shingle sampling for the
    candidate-generation stage (see ``minhash_signatures``); the
    verification stage ALWAYS uses full shingle sets, so every emitted
    pair's jaccard is exact and precision is 1 regardless of sampling —
    only candidate recall is traded."""
    sigs = minhash_signatures(df, k, n, text_col, id_col, shingle_keep_mod)
    cands = lsh_candidate_pairs(sigs, bands, id_col)
    return verify_candidate_pairs(df, cands, threshold, n, text_col, id_col)


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the iterative-join lineage: RELIABLE ``checkpoint()`` when
    the session has a checkpoint directory (files on shared storage
    survive executor loss — required on preemptible/spot clusters),
    eager ``localCheckpoint()`` otherwise (executor-local blocks; a
    lost executor makes the truncated lineage unrecoverable). Engine
    init sets a default checkpoint dir under the data folder whenever
    that is safe (durable scheme, or local master), so the reliable
    path is the default, not opt-in — see Engine._ensure_checkpoint_dir.

    The reliable path persists the frame around the checkpoint: an
    eager reliable checkpoint runs TWO jobs (the action, then the
    checkpoint-file write re-executing the unpersisted lineage — the
    classic persist-before-checkpoint rule), so without the wrap every
    caller paid its full upstream twice; pack_documents' upstream is a
    whole-corpus tokenize (guide §5: cache when recomputing costs more
    than the memory). The cache entry is dropped as soon as the
    checkpoint files exist — the returned frame reads those."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=True)


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Group duplicate pairs (id_a, id_b) into clusters: each node gets
    the minimum id reachable through the pair graph (connected
    components by iterative label propagation).

    Pure join/groupBy rounds — no driver-side collect loop over data;
    the driver only iterates until the label assignment reaches a
    fixpoint, which takes O(log(diameter)) rounds because labels hop
    through neighbors each round (dedup graphs are near-cliques, so
    2-3 rounds in practice). The fixpoint check rides the checkpoint
    job itself as an Observation metric — one job per round, not a
    second join+count job whose scheduling overhead dominated small
    corpora and whose extra pass is pure waste at large ones.
    Output: (doc_id, cluster_id).
    """
    from pyspark.sql import Observation

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    labels = _truncate_lineage(labels)
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        obs = Observation()
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("cluster_id").alias("__old__"),
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(F.col("cluster_id") != F.col("__old__"), 1).otherwise(0)
                ).alias("changed"),
            )
            .drop("__old__")
        )
        # truncate the growing lineage each round; the eager checkpoint
        # action also fires the fixpoint metric
        labels = _truncate_lineage(updated)
        if int(obs.get["changed"] or 0) == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


# -------------------------------------------------------------- SimHash

SIMHASH_BITS = 60


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document: each token votes ±1 on every bit of
    its 60-bit md5-derived hash (15 hex chars — the widest prefix that
    stays in signed 64-bit for both Spark and ANSI-SQL oracles); the
    signature sets bits with a positive vote sum. Map + one groupBy."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    hv = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    tok = tok.withColumn("hv", hv)
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("hv").bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return bit_sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | str | None = None,
    auto_cap_floor: int = 64,
    auto_cap_median_mult: int = 32,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, with LOSSLESS
    banded blocking: the signature is split into ``max_hamming + 1``
    bands, and by pigeonhole any pair within ``max_hamming`` flipped
    bits matches exactly on at least one band — so the banded equi-join
    has full recall, not the "usually shares the high byte" heuristic.
    Each band key is ~15 bits (32k buckets per band) and every join is
    keyed on (band, key); the all-pairs product never materializes, and
    the exact Hamming re-check on candidates makes precision 1.

    ``max_bucket`` (default off) trades the losslessness for
    boundedness: s docs sharing a band key emit s*(s-1)/2 candidate
    rows, and identical boilerplate shares the WHOLE simhash — every
    band collides — so one boilerplate family of 100k docs means 5e9
    candidates from each band. The cap skips buckets above the
    threshold before the self-join (one combiner-friendly count), same
    guard as ``lsh_candidate_pairs(max_bucket=)``; pairs whose every
    shared band bucket exceeds the cap are lost, so set it well above
    the expected true-dup family size. ``max_bucket="auto"`` sizes it
    from the data — max(``auto_cap_floor``, ``auto_cap_median_mult`` x
    the median bucket size), the same median-anchored rule as
    ``lsh_candidate_pairs`` (SCALE.md "Round-8" for why the median and
    not a tail quantile)."""
    sh = simhash(df, text_col, id_col)
    n_bands = max_hamming + 1
    width = SIMHASH_BITS // n_bands
    entries = []
    for i in range(n_bands):
        # the last band absorbs the remainder bits
        w = SIMHASH_BITS - i * width if i == n_bands - 1 else width
        key = F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit((1 << w) - 1))
        entries.append(F.struct(F.lit(i).alias("band"), key.alias("key")))
    keys = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*entries)).alias("__bk__")
    ).select(id_col, "simhash", F.col("__bk__.band").alias("band"), F.col("__bk__.key").alias("key"))
    if isinstance(max_bucket, str) and max_bucket != "auto":
        raise ValueError(f"max_bucket must be an int, None, or 'auto', got {max_bucket!r}")
    if max_bucket is not None:
        sizes = keys.groupBy("band", "key").agg(F.count(F.lit(1)).alias("__bucket_n__"))
        if max_bucket == "auto":
            cap_df = sizes.agg(
                F.greatest(
                    F.lit(auto_cap_floor).cast("long"),
                    F.ceil(
                        F.lit(float(auto_cap_median_mult))
                        * F.expr("percentile(__bucket_n__, 0.5)")
                    ),
                ).alias("__cap__")
            )
            keys = (
                keys.join(sizes, ["band", "key"])
                .crossJoin(F.broadcast(cap_df))
                .where(F.col("__bucket_n__") <= F.col("__cap__"))
                .drop("__bucket_n__", "__cap__")
            )
        else:
            keys = (
                keys.join(sizes, ["band", "key"])
                .where(F.col("__bucket_n__") <= max_bucket)
                .drop("__bucket_n__")
            )
    l = keys.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa__"), "band", "key"
    )
    r = keys.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb__"), "band", "key"
    )
    return (
        l.join(r, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa__", "__sb__")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__sa__").bitwiseXOR(F.col("__sb__"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def deduplicate_corpus(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_keep_mod: int | None = None,
) -> DataFrame:
    """The end of the dedup pipeline: the corpus WITHOUT near-duplicates.

    Composition of the scale path — MinHash → banded LSH candidates →
    exact Jaccard verification of candidates only → connected components
    → keep each cluster's minimum id — finished with one anti-join that
    drops every non-canonical member. Deterministic (the survivor of a
    duplicate cluster is always its smallest id), and the only O(·)
    terms are the LSH index build and the candidate verifications.

    Returns ``df`` rows minus dropped duplicates (schema unchanged).
    """
    pairs = minhash_dedup_pairs(df, threshold, k, bands, n, text_col, id_col, shingle_keep_mod)
    clusters = duplicate_clusters(
        pairs.select(F.col("id_a"), F.col("id_b"))
    )
    dropped = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(dropped, id_col, "left_anti")


# -------------------------------------------------- contamination check


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check (the n-gram-collision methodology
    publicly described for LLM training sets, e.g. the GPT-3 and PaLM
    papers): for each eval document, the fraction of its distinct word
    n-grams that appear anywhere in the training corpus.

    Scale shape: explode both corpora into distinct shingles; the train
    side deduplicates corpus-wide (one shuffle on the shingle key) into
    an inverted set; a LEFT SEMI join marks contaminated eval shingles
    and one per-doc aggregation emits the overlap. No pairwise doc×doc
    work — cost is O(total shingles), and skewed shingles are just
    larger join buckets handled by AQE.

    Output: (id_col, n_ngrams, n_contaminated, contamination_frac).
    """
    ev = explode_shingles(eval_df, text_col, id_col, n)
    tr = explode_shingles(train, text_col, id_col, n).select("shingle").distinct()
    hits = (
        ev.join(tr, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = eval_df.select(
        F.col(id_col), F.size(shingles(F.col(text_col), n)).alias("n_ngrams")
    )
    return totals.join(hits, id_col, "left").select(
        id_col,
        "n_ngrams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        F.round(
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_ngrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contamination_frac"),
    )
