"""Similarity search over embedding columns (``array<float>``).

- **Brute-force cosine top-k** — the exact baseline: broadcast the query
  set, score every (query, corpus) pair (Arrow-batched numpy by
  default; ``dim=`` opts into the codegen-unrolled JVM chain), rank
  per query. Cost is |Q|·|C| dot products, map-only over the corpus
  with the queries broadcast — at 100 TB this is the right shape for
  small query sets, and the component every ANN variant verifies
  against.
- **IVF (inverted-file) top-k** — the scale path: k-means-style coarse
  quantization using per-label centroids (the embeddings table carries a
  cluster ``label``; a production pipeline would learn centroids with
  Spark MLlib KMeans). Queries probe only the ``nprobe`` nearest
  centroids' buckets, cutting the scored pairs by |buckets|/nprobe while
  the bucket join stays a keyed equi-join (shuffle on label, skew
  handled by AQE).
- **Threshold pair counting** — cosine >= t pair enumeration for dedup
  pipelines (embedding-cosine near-dup).

Which cosine form is canonical for which shape (the SCALE.md "Round-9"
operational rule, measured):

- **Per-CANDIDATE-pair scoring over an unbounded pair stream** (LSH /
  blocking candidates, brute-force and threshold pair joins): the
  Arrow-batched numpy ``cosine_batch_udf`` — the interpreted
  ``zip_with``/``aggregate`` Column form is CodegenFallback at ~100us
  per evaluation, which IS the wall once the expression is evaluated
  once per pair (measured 0.75s vs 1.0s already at 20k pairs; ~100x at
  millions). ``dim=`` opts into the codegen-unrolled ``dot_fixed``
  chain instead: fully JVM-side (no Arrow transfer of pair-expanded
  vectors), but it costs ~dim x 6 py4j calls of PLAN build, so it only
  pays above ~10^6 scored pairs with a known small dim.
- **Whole-BUCKET quadratic verifies** (semantic dedup): one chunked
  numpy matmul per bucket inside ``applyInPandas``
  (``_bucket_near_pairs_fn``) — candidates never exist as rows; a hot
  bucket distributes EXACTLY via ``max_bucket_rows`` (one task per
  chunk pair, ``_chunk_pair_fn``).
- **Per-(row, centroid) assignment** (k-means assign, multi-probe):
  ``_numpy_centroid_assign`` — a mapInPandas batch distance scan with
  the centroid matrix in the closure.
- **Metadata-sized scoring** (|Q| x n_buckets centroid probes, exact
  re-rank of an |Q| x rerank shortlist): the Column ``cosine``/``dot``
  algebra stays — the pair count is bounded by index metadata, the
  interpreted cost is invisible, and the expression doubles as the
  SQL-oracle mirror.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf resolves pd.Series hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float array columns (f64 accumulate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled for a KNOWN dimension: a left-to-right chain
    of ``element_at(a,i) * element_at(b,i)`` adds seeded with 0.0 —
    bit-identical accumulation order to ``dot``, but fully
    codegen-able. ``zip_with``/``aggregate`` are CodegenFallback
    expressions: evaluated interpreted they cost ~100us per call
    (per-element type dispatch + a boxed intermediate array), which is
    invisible per-row but IS the whole wall when the expression lands in
    a join condition evaluated once per candidate pair (measured: the
    round-9 semantic-dedup verify crawled at ~350s CPU per task on a
    14k-vector fixture before this change). The unrolled chain compiles
    to primitive array getters; Spark splits long chains across
    generated methods, so realistic embedding dims stay inside codegen.
    Dims above 2048 fall back to ``dot`` (expression-tree depth)."""
    if dim > 2048:
        return dot(a, b)
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + (
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        )
    return acc


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm side yields NULL (never passes a threshold,
    # never ranks) instead of an ANSI DIVIDE_BY_ZERO error — the shared
    # never-pair policy for degenerate vectors.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_batch_udf():
    """Vectorized cosine as an Arrow-batched pandas UDF — the right
    tool when the cosine is evaluated once per CANDIDATE pair over an
    unbounded candidate stream (SCALE.md "Round-9" operational rule:
    the interpreted ``zip_with``/``aggregate`` form costs ~100us per
    evaluation; this is ~ns inside numpy). Degenerate rows — zero-norm,
    NULL, or length-mismatched vectors — yield NaN (the Column form
    yielded NULL for NULLs; both are dropped by every caller's guard) —
    note a Spark-side ``cos >= t`` compare PASSES NaN (NaN > any
    double), so callers thresholding the result must pair it with a
    ``~isnan`` guard (as ``embedding_near_dup_pairs`` does).

    Marked NON-DETERMINISTIC as an optimizer fence, not as a semantic
    statement (the function is a pure cosine): every ranking caller
    filters on the UDF-computed column (``ranked_topk``'s NaN guard),
    and Catalyst's filter pushdown then evaluates the UDF TWICE — once
    below the pushed filter and once in the surviving projection
    (plans/r13/sim_bruteforce_topk_before.txt shows the double
    ArrowEvalPython). The flag forbids the duplication, halving the
    Python-eval work of every corpus-sized scoring stage (guide §4.4
    pattern)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        av, bv = a.to_numpy(), b.to_numpy()
        n = len(av)
        lens_a = np.fromiter(
            (len(x) if x is not None else -1 for x in av), dtype=np.int64, count=n
        )
        lens_b = np.fromiter(
            (len(x) if x is not None else -1 for x in bv), dtype=np.int64, count=n
        )
        good = (lens_a == lens_b) & (lens_a > 0)
        if not good.any():
            return pd.Series(np.full(n, np.nan))
        # pairs can mix dims (e.g. a corrupt row): group by dim so each
        # stack is rectangular; the common case is one group
        out = np.full(n, np.nan)
        for dim in np.unique(lens_a[good]):
            idx = np.nonzero(good & (lens_a == dim))[0]
            A = np.stack(av[idx]).astype(np.float64, copy=False)
            B = np.stack(bv[idx]).astype(np.float64, copy=False)
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = (A * B).sum(axis=1) / (
                    np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
                )
        return pd.Series(out)

    return _cos.asNondeterministic()


MAX_COLLECTED_QUERIES = 4096


def collect_query_rows(
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int | None = None,
):
    """Driver-side query-set collect for the LUT-broadcast ANN serving
    paths (``pq.pq_topk``, ``ann_index.ivfpq_topk``), bounded so a
    mistakenly-large query TABLE fails with a clear error instead of
    building |Q| per-query lookup tables on the driver. The bound is
    enforced with a ``limit(n+1)`` collect — no separate count job.
    For query sets beyond the bound, the distributed-query paths
    (``ivf_index_topk`` / ``brute_force_topk``) are the right tool;
    callers with a deliberate larger broadcast budget pass
    ``max_queries`` explicitly."""
    bound = MAX_COLLECTED_QUERIES if max_queries is None else int(max_queries)
    rows = queries.select(id_col, vec_col).limit(bound + 1).collect()
    if len(rows) > bound:
        raise ValueError(
            f"query set exceeds {bound} rows: this ANN path collects queries "
            "driver-side to broadcast per-query LUTs; use ivf_index_topk or "
            "brute_force_topk for large query tables, or raise max_queries "
            "explicitly"
        )
    return rows


def ranked_topk(
    scored: DataFrame,
    k: int,
    key_col: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "cos",
) -> DataFrame:
    """Per-key top-k over a scored pair set — the ANN scoring paths'
    final rank, shared so every variant ranks identically (score desc,
    id asc, deterministic ties).

    Expressed as the canonical ``row_number().over(partitionBy(key))
    <= k`` filter ON PURPOSE: Spark >= 3.5 plans exactly this shape as
    a TWO-PHASE rank limit (SPARK-37099 — ``WindowGroupLimit Partial``
    before the exchange, ``Final`` after), so each input partition
    forwards only its k best rows per key and the exchange carries
    ~partitions x keys x k rows, never the corpus-sized scored set; no
    reducer sorts more than its survivors even when queries are few.
    A hand-rolled salted two-phase window is strictly worse here: same
    map-side work, but salts x more survivors through an EXTRA
    exchange. The pushdown applies while k <=
    ``spark.sql.optimizer.windowGroupLimitThreshold`` (default 1000 —
    far above any ANN k/rerank); the plan shape is pinned by
    tests/test_plans.py::test_ann_rank_is_two_phase so a regression
    can't silently reintroduce the full shuffle-and-sort.

    NaN scores (zero-norm query or corpus vector -> 0/0 cosine) are
    DROPPED before ranking: Spark and DuckDB both order NaN above every
    double, so without the filter a degenerate vector would outrank
    every true neighbor in EVERY variant's top-k. This is the one
    deliberate divergence from a naive SQL mirror that replays
    ``ORDER BY cos DESC`` without a NaN guard — all engine top-k paths
    (brute force, IVF, LSH, PQ) share this rank, so they agree with
    each other by construction."""
    w = Window.partitionBy(key_col).orderBy(F.col(score_col).desc(), F.col(id_col))
    return (
        # NULL (try_divide by zero norm) and NaN (numpy 0/0) both mean
        # "degenerate vector": drop before ranking. isnan(NULL) is
        # false in Spark, so the NOT NULL term is load-bearing.
        scored.where(
            F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col))
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(key_col, id_col, score_col, "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self-matches excluded). Ties broken by corpus id for determinism;
    cosine rounded to 6 before ranking so float noise can't flip ranks
    across engines. Output: (query_id, neighbor_id, cos, rank).

    The per-pair cosine is the Arrow-batched numpy form by default —
    this is the unbounded-pair-stream shape of the module docstring's
    canonical-form rule (the interpreted Column form measured 1.4x
    slower already at 20k pairs and ~100x at millions). Passing ``dim``
    swaps in the codegen-unrolled ``dot_fixed`` chain instead: fully
    JVM-side, no Arrow transfer of the pair-expanded vectors — the form
    for billion-pair scans with a known small dim, but it costs ~dim x
    6 py4j calls of PLAN build (~2 s at dim=64), so it stays opt-in."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__")
    )
    if dim is not None:
        # norms once per side before the join (a per-pair cosine()
        # would recompute both norms |Q|·|C| times)
        q = q.withColumn("__qn__", norm_fixed(F.col("__qv__"), dim))
        c = c.withColumn("__cn__", norm_fixed(F.col("__cv__"), dim))
        cos = F.try_divide(
            dot_fixed(F.col("__qv__"), F.col("__cv__"), dim),
            F.col("__qn__") * F.col("__cn__"),
        )
    else:
        cos = cosine_batch_udf()(F.col("__qv__"), F.col("__cv__"))
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.withColumn("cos", F.round(cos, 6))
    return ranked_topk(scored, k)


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal marginal relevance re-rank (Carbonell & Goldstein, SIGIR
    1998 — the standard diversity re-rank for retrieval and
    training-data sampling): greedily select ``k`` of each query's
    candidates maximizing ``lam * rel - (1 - lam) * max_sim_to_selected``,
    so near-duplicate candidates can't crowd a result list. ``lam=1``
    degenerates to plain top-k; lower ``lam`` trades relevance for
    diversity.

    ``candidates`` is any scored top-N frame of shape (query_id,
    neighbor_id, cos) — ``brute_force_topk`` / ``ivf_index_topk`` /
    ``ivfpq_topk`` output feeds in directly, so the candidate generator
    and the re-rank compose freely. Returns (query_id, neighbor_id,
    mmr_rank) with mmr_rank 1..k in selection order.

    Scale shape: one hash join attaches candidate vectors (the
    candidate side is |Q| x N rows — tiny next to the corpus; AQE
    broadcasts it when it fits), then ONE ``applyInPandas`` group per
    query runs the greedy loop over its own N candidates — per-task
    memory is N x dim + N^2 scores, bounded by the pool size, and
    queries distribute freely (no driver-side query collect, unlike
    the LUT paths — this re-rank serves unbounded query tables).
    Pairwise sims round to 6 decimals like every cosine in this module
    so ranks can't flip across engines; ties break to the smallest
    neighbor id; the empty-selected-set similarity term is 0. NaN-rel
    candidates never arrive (ranked_topk drops them) and zero-norm
    pairwise sims count as 0 via try-divide semantics."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv__")
    )
    j = candidates.select("query_id", "neighbor_id", "cos").join(nv, "neighbor_id")
    qid_type = j.schema["query_id"].dataType
    nid_type = j.schema["neighbor_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", qid_type, True),
            T.StructField("neighbor_id", nid_type, True),
            T.StructField("mmr_rank", T.IntegerType(), False),
        ]
    )
    lam64 = float(lam)

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cos"].to_numpy().astype(np.float64)
        V = np.stack(pdf["__nv__"].to_numpy()).astype(np.float64, copy=False)
        n = len(ids)
        norms = np.sqrt((V * V).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = (V @ V.T) / (norms[:, None] * norms[None, :])
        # round HALF-AWAY-FROM-ZERO (floor(|x|*1e6 + 0.5)), matching
        # Spark's F.round and DuckDB's round() — np.round is half-even
        # and would disagree with the SQL oracle exactly on the .5
        # boundaries a low-entropy corpus can hit
        sims = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        sims = np.nan_to_num(sims, nan=0.0)
        # first pick: S is empty, the similarity term is 0 by
        # convention, so the score is lam * rel for every candidate
        pick = int(np.lexsort((ids, -(lam64 * rel)))[0])
        selected: list[int] = [pick]
        remaining = np.ones(n, dtype=bool)
        remaining[pick] = False
        # TRUE max over the selected set — no 0 floor: a candidate
        # anti-correlated with everything selected gets a BOOST, the
        # standard MMR semantics (and what the SQL oracle replays)
        max_sim = sims[:, pick].copy()
        for _ in range(min(k, n) - 1):
            score = np.where(
                remaining, lam64 * rel - (1.0 - lam64) * max_sim, -np.inf
            )
            # argmax with smallest-id ties: lexsort is ascending, so
            # sort by (-score, id) and take the first
            pick = int(np.lexsort((ids, -score))[0])
            selected.append(pick)
            remaining[pick] = False
            max_sim = np.maximum(max_sim, sims[:, pick])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy()[selected],
                "neighbor_id": ids[selected],
                "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return j.groupBy("query_id").applyInPandas(fn, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Approximate top-k via inverted-file probing.

    1. centroid per bucket = element-wise mean of its vectors
       (one groupBy; with learned KMeans centroids this input is tiny),
    2. each query scores all centroids (broadcast — there are few) and
       keeps its ``nprobe`` nearest buckets,
    3. the (query, bucket) pairs equi-join the corpus on the bucket key
       and exact cosine ranks within the probed subset.

    Recall < 1 by construction; callers validate against
    ``brute_force_topk`` (see tests).
    """
    centroids = bucket_centroids(corpus, vec_col, bucket_col)
    return probe_topk(corpus, centroids, queries, k, nprobe, id_col, vec_col, bucket_col)


def bucket_centroids(corpus: DataFrame, vec_col: str = "embedding", bucket_col: str = "label") -> DataFrame:
    """Element-wise mean vector per bucket: (bucket_col, centroid
    float array). One groupBy over the exploded dimensions — this is the
    index-build half of IVF, persisted by operators/ann_index.py."""
    exploded = corpus.select(
        F.col(bucket_col), F.posexplode(F.col(vec_col)).alias("__i__", "__x__")
    )
    return (
        exploded.groupBy(bucket_col, "__i__")
        .agg(F.avg("__x__").alias("__m__"))
        .groupBy(bucket_col)
        .agg(F.array_sort(F.collect_list(F.struct("__i__", "__m__"))).alias("__s__"))
        .select(
            F.col(bucket_col),
            F.transform(F.col("__s__"), lambda s: s["__m__"].cast("float")).alias("centroid"),
        )
    )


def probe_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    drop_nan: bool = False,
    probes: DataFrame | None = None,
) -> DataFrame:
    """The probe half of IVF: queries score the (small, broadcast)
    centroid set, keep their ``nprobe`` nearest buckets, and exact-rank
    within the probed subset only. ``centroids`` must be
    (bucket_col, centroid) as produced by ``bucket_centroids`` or read
    from a persisted index.

    ``probes`` accepts a PRE-COMPUTED (query_id, __qv__, __bucket__)
    probe-assignment frame (``ivf_index_topk`` materializes one so its
    probed-bucket collect and this scan share a single probe
    computation instead of re-running the |Q| x n_buckets cross + rank
    per consumer); None keeps the self-contained construction.

    ``drop_nan=True`` removes NaN-cosine candidates (zero-norm or
    malformed corpus vectors) BEFORE the rank: Spark orders NaN above
    every double, so with the default a single degenerate corpus vector
    consumes a top-k slot in its bucket and a post-rank isnan filter
    would MASK the real k-th neighbor — callers whose downstream logic
    filters NaN (the dedup admission gate) must drop pre-rank instead.
    Default off: the historical NaN-ranked-first semantics are pinned
    by the DuckDB oracles (which order NaN the same way).

    The bucket-scan cosine — evaluated once per (candidate, probed
    query), the corpus-sized term — is the vectorized
    ``cosine_batch_udf`` (SCALE.md "Round-9": per-pair interpreted
    Column cosines are the ~100us trap). The |Q| x n_buckets centroid
    probe stays Column algebra: its UNROUNDED ranking decides which
    buckets are scanned, and the sequential-sum Column form is what
    the exact DuckDB oracles reproduce term-for-term."""
    if probes is None:
        centroids = centroids.select(
            F.col(bucket_col).alias("__bucket__"),
            F.col("centroid").alias("__centroid__"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv__"),
        )
        probe_w = Window.partitionBy("query_id").orderBy(
            F.col("__ccos__").desc(), F.col("__bucket__")
        )
        probes = (
            q.crossJoin(F.broadcast(centroids))
            .withColumn("__ccos__", cosine(F.col("__qv__"), F.col("__centroid__")))
            .withColumn("__pr__", F.row_number().over(probe_w))
            .where(F.col("__pr__") <= nprobe)
            .select("query_id", "__qv__", F.col("__bucket__"))
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        F.col(bucket_col).alias("__bucket__"),
    )
    cos_udf = cosine_batch_udf()
    scored = (
        c.join(F.broadcast(probes), "__bucket__")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cos_udf(F.col("__qv__"), F.col("__cv__")), 6))
    )
    if drop_nan:
        scored = scored.where(~F.isnan(F.col("cos")))
    return ranked_topk(scored, k)


def kmeans_buckets(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample: int | None = None,
) -> DataFrame:
    """Train an IVF coarse quantizer with Spark MLlib KMeans and assign
    every vector its bucket — the index-build step for ``ivf_topk`` when
    no natural cluster column exists. Returns the corpus plus an
    ``ivf_bucket`` int column; assignment is a map-only transform.

    ``fit_sample`` bounds the TRAINING set: the fit runs on that many
    vectors ranked by a seeded hash of their id (the
    ``pq.train_pq_codebooks`` sampling contract — deterministic and
    content-unbiased, unlike lowest-ids-first on a corpus whose ids
    track ingest time), while assignment still covers every vector.
    Coarse centroids converge on a sample (k << sample works fine);
    iterating MLlib over the full corpus buys nothing at 100TB scale.
    Default None keeps the historical full-corpus fit for small/exact
    callers."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = corpus.withColumn("__mlvec__", array_to_vector(F.col(vec_col).cast("array<double>")))
    fit_input = with_vec
    if fit_sample is not None:
        fit_input = (
            with_vec.select(id_col, "__mlvec__")
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(int(fit_sample))
        )
    model = KMeans(k=k, seed=seed, featuresCol="__mlvec__", predictionCol="ivf_bucket").fit(
        fit_input
    )
    return model.transform(with_vec).drop("__mlvec__")


def _numpy_centroid_assign(
    corpus: DataFrame,
    centroids,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Corpus + ``ivf_bucket`` via MAP-ONLY nearest-centroid assignment
    (one row per probed bucket when ``nprobe > 1``): a ``mapInPandas``
    pass scores each Arrow batch against the k x dim centroid matrix in
    numpy — squared Euclidean, ties by bucket id (stable argsort over
    centroids stored in bucket order) — and emits the ``nprobe``
    nearest. No shuffle, no window, no N x k intermediate ever leaves
    the batch; the centroid matrix rides the UDF closure (metadata-
    sized). The row-chunked distance computation caps the in-flight
    chunk x k x dim difference tensor at ~32 MB at any k/dim.

    Vectorized numpy ON PURPOSE, measured against two Column-algebra
    shapes at 50k rows / k=100 / dim=64 (SCALE.md "Round-9"): a
    ``transform``+``zip_with`` scored array is CodegenFallback —
    interpreted ~100us per (row, centroid) = ~10ms per ROW at k=100 —
    and an unrolled per-term literal expression moves the cost to PLAN
    construction and analysis (~6k py4j calls + a 13k-node tree:
    45s before the first task launches). The numpy matmul-style scan
    is ~us per row and scales with rows, not rows x k."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    k = len(C)
    nprobe = min(int(nprobe), k)
    dim = C.shape[1] if k else 0
    out_schema = T.StructType(
        list(corpus.schema.fields)
        + [T.StructField("ivf_bucket", T.IntegerType(), False)]
    )
    chunk = max(1, (1 << 22) // max(k * dim, 1))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            tops = []
            for s in range(0, len(X), chunk):
                d2 = ((X[s : s + chunk, None, :] - C[None, :, :]) ** 2).sum(-1)
                # stable sort on d2: equal distances keep bucket order
                tops.append(np.argsort(d2, axis=1, kind="stable")[:, :nprobe])
            top = np.concatenate(tops)
            out = pdf.iloc[np.repeat(np.arange(len(pdf)), nprobe)].reset_index(
                drop=True
            )
            out["ivf_bucket"] = top.reshape(-1).astype("int32")
            yield out

    return corpus.mapInPandas(assign, out_schema)


def numpy_kmeans_buckets(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample: int = 4096,
    iters: int = 10,
    return_centroids: bool = False,
    return_sample: bool = False,
):
    """``kmeans_buckets`` without the MLlib job overhead: Lloyd's
    iterations run in numpy on a bounded seeded hash-ordered sample
    collected to the driver (the ``pq.train_pq_codebooks`` sampling
    contract — FAISS trains its coarse quantizers the same way,
    in-core on a sample), and assignment is the map-only
    literal-centroid scan shared with
    ``kmeans_multiprobe_assignments``. Same output contract as
    ``kmeans_buckets`` (corpus + ``ivf_bucket``); different (equally
    valid) clusterings — callers whose results must reproduce a
    specific MLlib clustering keep ``kmeans_buckets``. Preferred for
    index BUILDS, where a fit over a few thousand sampled vectors was
    paying ~10 MLlib jobs of pure scheduling overhead (measured in
    TESTDATA.md's per-entry runtimes, round-9). Driver memory is
    ``fit_sample x dim x 8`` bytes (65536 x 64-dim = 33 MB; at dim
    4096 drop ``fit_sample`` to ~8192 or use ``kmeans_buckets``).
    ``return_centroids=True`` also returns the fitted k x dim float64
    centroid matrix so index builds can store the quantizer centroids
    directly (the FAISS convention) instead of re-scanning the corpus
    for posterior bucket means. ``return_sample=True`` additionally
    returns the collected hash-ordered sample matrix itself (float64,
    in ``xxhash64(id, seed), id`` order): a PQ/OPQ codebook fit over
    the SAME (corpus, seed) samples a PREFIX of exactly these rows
    (``pq._driver_sample`` shares the ordering contract), so index
    builds can derive their codebook training set driver-side instead
    of paying a second full-corpus TopK collect."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(int(fit_sample))
        .collect()
    )
    X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(len(C)):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(0)
    assigned = _numpy_centroid_assign(corpus, C, vec_col, nprobe=1)
    if return_centroids and return_sample:
        return assigned, C, X
    return (assigned, C) if return_centroids else assigned


def kmeans_multiprobe_assignments(
    corpus: DataFrame,
    k: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample: int | None = None,
) -> DataFrame:
    """The corpus plus an ``ivf_bucket`` column, one row per (vector,
    probed bucket) — each vector appears with its ``nprobe`` NEAREST
    centroids (squared-Euclidean, KMeans' own metric; ties broken by
    bucket id) —
    the multi-probe assignment that recovers cluster-BOUNDARY recall for
    ``semantic_dedup``: a near-dup pair split across adjacent clusters
    still meets in one of them when each vector also joins its
    runner-up cluster. Candidate cost is ~``nprobe``^2 x (every
    bucket's effective membership multiplies by ``nprobe`` and
    within-bucket pairs are quadratic in membership), but with the
    numpy-matmul verify that growth disappears into BLAS throughput:
    the measured end-to-end wall at nprobe=2 is ~1.2x the nprobe=1
    line (SCALE.md "Round-9" — the round-8 crossJoin+window assignment
    plus join-based verify cost 16x). Same fit as ``kmeans_buckets``
    (seeded, optionally sample-bounded); assignment is MAP-ONLY via
    ``_numpy_centroid_assign`` (batch numpy distance scan, centroids
    in the UDF closure) — no shuffle, no window, no N x k intermediate
    ever leaves the batch."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = corpus.withColumn(
        "__mlvec__", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    fit_input = with_vec
    if fit_sample is not None:
        fit_input = (
            with_vec.select(id_col, "__mlvec__")
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(int(fit_sample))
        )
    model = KMeans(
        k=k, seed=seed, featuresCol="__mlvec__", predictionCol="ivf_bucket"
    ).fit(fit_input)
    return _numpy_centroid_assign(
        corpus, model.clusterCenters(), vec_col, nprobe=nprobe
    )


def _signature_keys(
    df: DataFrame,
    tables: int,
    planes: int,
    dim: int,
    seed: int,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """(out_id, __t__, __sig__) — one sign-LSH signature row per (row,
    hash table), from fixed pseudo-random hyperplanes (deterministic in
    ``seed``; same generator stream as the Column-literal builder this
    replaced, so bucket assignments are unchanged up to sign-at-zero
    knife edges). Computed as ONE numpy matmul per Arrow batch inside
    ``mapInPandas``: the previous plan-literal form built tables x
    planes x dim ``lit`` nodes (4,096 py4j calls at the defaults — the
    measured dominant cost of the LSH entries at fixture scale) and
    evaluated each plane's dot interpreted per row. The hyperplane
    matrix rides the UDF closure; map-only, no shuffle. The id column
    passes through with its INPUT type (long, string, ...) — the
    output schema is derived from the input field, not hardcoded."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(out_id, id_field.dataType, id_field.nullable),
            T.StructField("__t__", T.IntegerType(), False),
            T.StructField("__sig__", T.IntegerType(), False),
        ]
    )
    rng = np.random.default_rng(seed)
    H2 = rng.normal(0.0, 1.0, (tables, planes, dim)).reshape(tables * planes, dim)
    weights = (1 << np.arange(planes)).astype(np.int64)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            bits = (V @ H2.T) >= 0
            sigs = (
                (bits.reshape(len(V), tables, planes) * weights[None, None, :])
                .sum(-1)
                .astype("int32")
            )
            yield pd.DataFrame(
                {
                    out_id: np.repeat(pdf[id_col].to_numpy(), tables),
                    "__t__": np.tile(
                        np.arange(tables, dtype="int32"), len(V)
                    ),
                    "__sig__": sigs.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(fn, out_schema)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.99,
    tables: int = 8,
    planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos) over one
    corpus — the embedding leg of the dedup family.

    Corpus×corpus at scale, so no broadcast anywhere: rows are bucketed
    by (hash table, sign signature) and candidates are pairs sharing a
    bucket in ANY of the ``tables`` tables — a self equi-join on the
    bucket key carrying ids only (the vectors are re-fetched by id after
    candidate dedup). Exact cosine then verifies every candidate —
    vectorized (``cosine_batch_udf``), since the candidate stream is
    unbounded and a per-pair interpreted cosine is the ~100us trap of
    SCALE.md "Round-9" — so precision is 1 by construction; recall is
    the standard multi-table sign-LSH guarantee (near-identical vectors
    share all sign bits). A pathologically dense bucket (m rows → m²
    candidate pairs) is the skew risk; ``planes`` is the blocking-
    granularity lever and AQE's skew-join handles residual imbalance.

    Zero-norm vectors (NaN cosine) are explicitly EXCLUDED: Spark and
    DuckDB both treat NaN as greater than any double, so a bare
    ``cos >= threshold`` replay would pair a degenerate vector with
    every bucket peer. All near-pair paths share this policy
    (``semantic_near_pairs``' numpy compare rejects NaN the same way);
    a SQL oracle replaying the threshold must add the NaN guard."""
    keys = _signature_keys(
        corpus, tables, planes, dim, seed, id_col, vec_col, "__id__"
    )
    a_keys = keys.select(F.col("__id__").alias("id_a"), "__t__", "__sig__")
    b_keys = keys.select(F.col("__id__").alias("id_b"), "__t__", "__sig__")
    cands = (
        a_keys.join(b_keys, ["__t__", "__sig__"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = corpus.select(
        F.col(id_col).alias("__vid__"), F.col(vec_col).alias("__v__")
    )
    cos_udf = cosine_batch_udf()
    return (
        cands.join(vecs.withColumnRenamed("__vid__", "id_a"), "id_a")
        .withColumnRenamed("__v__", "__av__")
        .join(vecs.withColumnRenamed("__vid__", "id_b"), "id_b")
        .withColumn(
            "cos", F.round(cos_udf(F.col("__av__"), F.col("__v__")), 6)
        )
        .where(~F.isnan(F.col("cos")) & (F.col("cos") >= threshold))
        .select("id_a", "id_b", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane (sign) LSH.

    ``tables`` independent hash tables, each a ``planes``-bit signature
    (sign of the dot product with fixed pseudo-random hyperplanes,
    generated deterministically from ``seed`` and shipped as plan
    literals). Candidates are corpus rows sharing the query's bucket in
    ANY table — the standard recall lever: a single table's bucket holds
    only near-identical sign patterns, the union catches neighbors that
    disagree on a few planes. Every join is a keyed equi-join on
    (table, signature); the all-pairs product never materializes, and
    candidate vectors are fetched by id after dedup so the ``tables``-way
    explode carries ids only. Complements ``ivf_topk`` when no cluster
    structure (bucket column / trained centroids) exists.
    """
    q_keys = _signature_keys(
        queries, tables, planes, dim, seed, id_col, vec_col, "query_id"
    )
    c_keys = _signature_keys(
        corpus, tables, planes, dim, seed, id_col, vec_col, "neighbor_id"
    )
    cands = (
        c_keys.join(F.broadcast(q_keys), ["__t__", "__sig__"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__")
    )
    cos_udf = cosine_batch_udf()
    scored = (
        cands.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cos_udf(F.col("__qv__"), F.col("__cv__")), 6))
    )
    return ranked_topk(scored, k)


def cosine_threshold_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) pairs with cosine >= threshold, a < b. Broadcast the
    smaller side; for corpus-x-corpus near-dup at scale, pre-block with
    LSH/IVF buckets and feed the blocked pairs here. Zero-norm vectors
    (NaN cosine) never pair — the shared policy of every near-pair
    path (see ``embedding_near_dup_pairs``). Scoring is the
    Arrow-batched numpy cosine: this is a per-candidate-pair stream,
    the canonical-form rule's slow-path-never shape (module
    docstring)."""
    a = left.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__av__"))
    b = right.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__bv__"))
    cos_udf = cosine_batch_udf()
    return (
        b.crossJoin(F.broadcast(a))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cos_udf(F.col("__av__"), F.col("__bv__")), 6))
        .where(~F.isnan(F.col("cos")) & (F.col("cos") >= threshold))
        .select("id_a", "id_b", "cos")
    )


def _bucket_near_pairs_fn(threshold: float, vec_col: str):
    """``applyInPandas`` body for the within-bucket near-pair verify:
    the bucket's cosine matrix in chunked numpy matmuls (BLAS), one
    output row per surviving pair with ``id_a < id_b`` strictly by id
    (duplicate ids never pair, either orientation emitted once —
    exactly the join-based semantics). Block size is capped so the
    in-flight block x m score matrix stays ~32 MB regardless of bucket
    size; the bucket's own vectors (m x dim doubles) are the real
    memory bound, as they are for any per-bucket design. Zero-norm
    rows produce NaN cosines, which FAIL the numpy ``>=`` compare —
    deliberately NOT the retired join form's semantics (Spark and
    DuckDB order NaN above any double, so ``cos >= t`` there PASSED
    zero-norm vectors against every bucket peer); every near-pair
    path now shares this never-pair-NaN policy, and a SQL oracle
    replaying the threshold needs an explicit NaN guard."""
    import numpy as np
    import pandas as pd

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m < 2:
            empty = pdf["__id__"].iloc[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        ids = pdf["__id__"].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        norms = np.sqrt((V * V).sum(axis=1))
        out_a, out_b = [], []
        bs = max(1, (1 << 22) // m)
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, m, bs):
                block = V[s : s + bs] @ V.T
                cos = block / (norms[s : s + bs, None] * norms[None, :])
                ii, jj = np.nonzero(cos >= threshold)
                keep = ids[jj] > ids[s + ii]
                out_a.append(ids[s + ii[keep]])
                out_b.append(ids[jj[keep]])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return fn


def _chunk_pair_fn(threshold: float, vec_col: str):
    """``applyInPandas`` body for the HOT-BUCKET chunked verify: one
    task per (bucket, chunk_i, chunk_j) pair. The diagonal task
    (i == j) computes its chunk's triangle exactly like
    ``_bucket_near_pairs_fn``; an off-diagonal task computes the CROSS
    cosine block between its two chunks. Every unordered within-bucket
    pair lands in exactly one task (its members' chunk pair), so the
    union over tasks reproduces the single-task verify bit-for-bit with
    per-task memory bounded by TWO chunks instead of the whole bucket —
    and the quadratic work spreads across the cluster instead of
    serializing into one worker. The cross block masks ``ida == idb``
    to mirror the diagonal's STRICT ``>`` compare: today's chunk
    assignment (xxhash64 of the id) co-locates duplicate ids so the
    cross block never sees an equal pair, but the function must stay
    partitioner-independent — under any assignment that splits a
    duplicated id across chunks, an unmasked cross block would emit an
    (x, x) self-pair the single-task path never produces."""
    import numpy as np
    import pandas as pd

    def fn(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        ti, tj = int(key[1]), int(key[2])
        if ti == tj:
            return _bucket_near_pairs_fn(threshold, vec_col)(pdf)
        a_pdf = pdf[pdf["__c__"] == ti]
        b_pdf = pdf[pdf["__c__"] == tj]
        if not len(a_pdf) or not len(b_pdf):
            empty = pdf["__id__"].iloc[:0]
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        ids_a = a_pdf["__id__"].to_numpy()
        ids_b = b_pdf["__id__"].to_numpy()
        VA = np.stack(a_pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        VB = np.stack(b_pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
        na = np.sqrt((VA * VA).sum(axis=1))
        nb = np.sqrt((VB * VB).sum(axis=1))
        out_a, out_b = [], []
        bs = max(1, (1 << 22) // max(len(VB), 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            for st in range(0, len(VA), bs):
                block = VA[st : st + bs] @ VB.T
                cos = block / (na[st : st + bs, None] * nb[None, :])
                ii, jj = np.nonzero(cos >= threshold)
                ida, idb = ids_a[st + ii], ids_b[jj]
                keep = ida != idb
                out_a.append(np.minimum(ida[keep], idb[keep]))
                out_b.append(np.maximum(ida[keep], idb[keep]))
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return fn


def semantic_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.97,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample: int | None = 65536,
    assignments: DataFrame | None = None,
    nprobe: int = 1,
    max_bucket_rows: int | str | None = None,
    auto_chunk_floor: int = 4096,
    auto_chunk_median_mult: int = 4,
) -> DataFrame:
    """The verified near-duplicate PAIRS of the SemDeDup pipeline:
    cluster (or reuse ``assignments``), self-join ids within each
    cluster, and keep pairs with exact cosine >= ``threshold``. This is
    ``semantic_dedup``'s candidate+verify core, exposed so recall
    audits and custom survivor policies can consume the pairs directly.

    ``nprobe > 1`` assigns each vector to its ``nprobe`` nearest
    clusters (``kmeans_multiprobe_assignments``): pairs straddling a
    cluster BOUNDARY — the paper's documented recall trade — get a
    second chance to meet, at ~``nprobe``^2 x candidate cost (bucket
    membership multiplies by ``nprobe``; within-bucket pairs are
    quadratic in it). NaN-bearing vectors are excluded from
    clustering (their cosine is NaN — they can never pair; MLlib
    rejects them anyway).

    Plan shape (round-9, chosen after MEASURING three designs at 50k
    vectors / 12.5M candidates, SCALE.md "Round-9"): the corpus
    exchanges ONCE on the bucket key and each bucket's quadratic
    verify runs as a CHUNKED NUMPY MATMUL inside ``applyInPandas`` —
    only survivors (true near-dups) ever become rows. The alternatives
    both materialize the candidate pairs as JVM rows: (a) round-8's
    ids-only self-join re-shuffled the candidate volume three times
    (distinct + two re-attach joins) and paid ~100us/pair for the
    interpreted ``zip_with``/``aggregate`` cosine (55s); (b) an
    in-stage sort-merge-join condition with the codegen-unrolled
    ``dot_fixed`` cosine still paid per-pair row iteration (167s —
    WORSE: pair generation itself dominates). BLAS does the 12.5M
    dot products in under a second; the whole verify including the
    exchange measured ~3s. Arrow transfer is corpus x ``nprobe``
    volume, never candidates. By default a hot bucket serializes into
    one worker and must fit its vectors in that worker's memory
    (m x dim x 8 bytes — 10M x 64-dim = 5 GB; the matmul itself is
    chunked to a fixed ~32 MB block, so memory is the VECTORS, not the
    m^2 pair matrix); ``n_clusters`` is the first lever.
    ``max_bucket_rows=M`` removes the ceiling EXACTLY: buckets larger
    than M split into hash chunks of ~M rows and the verify runs one
    task per (chunk_i, chunk_j) pair — per-task memory is TWO chunks,
    the quadratic work spreads across the cluster, and every unordered
    pair lands in exactly one task so the output is bit-identical to
    the single-task path (tested; measured on a 60k-vector single hot
    bucket at local[32]: 65.8 s single-task -> 12.4 s at M=8000 ->
    7.5 s at M=3000, identical pairs — SCALE.md "Round-10"). The cost is Arrow re-transfer: each
    hot-bucket row ships to its n_chunks tasks, i.e. transfer grows by
    ~m/M for that bucket — the unavoidable price of distributing m^2
    work; small buckets (<= M) keep the one-task path unchanged.
    ``max_bucket_rows="auto"`` sizes M FROM THE DATA with the same
    median-anchored rule as the LSH/SimHash caps: M =
    max(``auto_chunk_floor``, ``auto_chunk_median_mult`` x the median
    bucket size) — typical buckets (near the median under a sane k)
    stay one-task, only genuine hot buckets chunk, and the floor stops
    tiny corpora from paying chunk-task overhead. Any chunked run
    (int or "auto") is EAGER: the assignment is persisted across the
    size pass and the verify (one corpus map instead of two), then the
    survivor pairs are checkpoint-materialized and the corpus-sized
    cache released before returning. ``nprobe > 1`` dedups pairs that
    co-occur in several probed buckets with a distinct over SURVIVORS,
    not candidates."""
    has_nan = F.exists(F.col(vec_col), F.isnan)
    if assignments is not None:
        assigned = corpus.select(id_col, vec_col).join(
            assignments.select(id_col, "ivf_bucket"), id_col
        )
    elif nprobe > 1:
        assigned = kmeans_multiprobe_assignments(
            corpus.where(~has_nan).select(id_col, vec_col),
            k=n_clusters,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            fit_sample=fit_sample,
        )
    else:
        assigned = kmeans_buckets(
            corpus.where(~has_nan).select(id_col, vec_col),
            k=n_clusters,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            fit_sample=fit_sample,
        ).select(id_col, vec_col, "ivf_bucket")
    from pyspark.sql import types as T

    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type, True),
            T.StructField("id_b", id_type, True),
        ]
    )
    rows = assigned.select(
        "ivf_bucket", F.col(id_col).alias("__id__"), F.col(vec_col)
    )
    if max_bucket_rows is None:
        pairs = rows.groupBy("ivf_bucket").applyInPandas(
            _bucket_near_pairs_fn(float(threshold), vec_col), out_schema
        )
        if nprobe > 1:
            # a pair can co-occur in several probed buckets; the distinct
            # runs over SURVIVORS (true near-dups), not the candidates
            pairs = pairs.distinct()
        return pairs
    if isinstance(max_bucket_rows, str):
        if max_bucket_rows != "auto":
            raise ValueError(
                f"max_bucket_rows must be an int, None, or 'auto', got {max_bucket_rows!r}"
            )
    elif max_bucket_rows <= 0:
        raise ValueError(f"max_bucket_rows must be positive, got {max_bucket_rows}")
    from pyspark import StorageLevel

    from modelardb_rs_spark.operators.dedup import _truncate_lineage

    spark = corpus.sparkSession
    # the clustering/assignment lineage feeds BOTH the size pass and the
    # verify: persist it so the dominant map cost (the numpy assignment
    # over the whole corpus) runs once, not twice — the sizes collect
    # below materializes the cache, the verify reads it, and the final
    # survivor materialization releases it before returning
    rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
    # bucket sizes are index metadata (n_buckets tiny rows): one
    # count aggregate, broadcast back as a chunk-count frame
    sizes = rows.groupBy("ivf_bucket").agg(F.count("*").alias("__n__")).collect()
    if max_bucket_rows == "auto":
        # median-anchored cap, the family rule shared with the LSH and
        # SimHash bucket caps (dedup.lsh_candidate_pairs): clusters are
        # near the median when k is sane, so a generous multiple of the
        # median leaves typical buckets on the one-task path and chunks
        # only genuine hot buckets. The floor keeps tiny corpora from
        # chunking at all (chunk-pair task overhead would dominate).
        counts = sorted(int(r["__n__"]) for r in sizes)
        med = counts[len(counts) // 2] if counts else 0
        # clamp to >= 1: floor=0 with mult*median == 0 (empty/tiny corpus
        # or mult=0) must degrade to one-row chunks, not a ceil-division
        # ZeroDivisionError the int path's validation would have caught
        max_bucket_rows = max(
            1, int(auto_chunk_floor), int(auto_chunk_median_mult) * med
        )
    nchunks_df = spark.createDataFrame(
        [
            (int(r["ivf_bucket"]), -(-int(r["__n__"]) // int(max_bucket_rows)))
            for r in sizes
        ],
        "ivf_bucket INT, __nc__ INT",
    )
    tagged = rows.join(F.broadcast(nchunks_df), "ivf_bucket").withColumn(
        "__c__",
        F.pmod(F.xxhash64(F.col("__id__")), F.col("__nc__")).cast("int"),
    )
    # each row joins every (chunk_i, chunk_j) task it belongs to:
    # one explode over its bucket's chunk count — a row in chunk c
    # meets partner chunk o in task (min(c,o), max(c,o)), each
    # exactly once, so no post-dedup is needed
    tasks = (
        tagged.withColumn(
            "__o__", F.explode(F.sequence(F.lit(0), F.col("__nc__") - 1))
        )
        .withColumn("__ti__", F.least("__c__", "__o__"))
        .withColumn("__tj__", F.greatest("__c__", "__o__"))
    )
    pairs = tasks.groupBy("ivf_bucket", "__ti__", "__tj__").applyInPandas(
        _chunk_pair_fn(float(threshold), vec_col), out_schema
    )
    if nprobe > 1:
        pairs = pairs.distinct()
    # materialize the survivors while the assignment cache is hot, then
    # release the corpus-sized cache eagerly (a long-lived session must
    # not accumulate MEMORY_AND_DISK blocks — the collapse_exact policy).
    # Survivors are the true near-dup pairs: bounded by the duplicate
    # mass, narrow (two ids), and consumed downstream anyway.
    pairs = _truncate_lineage(pairs)
    rows.unpersist()
    return pairs


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.97,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample: int = 65536,
    assignments: DataFrame | None = None,
    collapse_exact: bool = False,
    nprobe: int = 1,
    max_bucket_rows: int | str | None = None,
    auto_chunk_floor: int = 4096,
    auto_chunk_median_mult: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embeddings, find
    cosine >= ``threshold`` pairs WITHIN each cluster only, group them
    into connected components, and keep one representative (the minimum
    id) per component. Returns the corpus minus dropped semantic
    duplicates (schema unchanged).

    This is the embedding-space sibling of MinHash corpus dedup: where
    MinHash catches lexical near-copies, semantic dedup drops documents
    that SAY the same thing — the paper's result is that pruning these
    speeds convergence at equal quality.

    Scale shape (the paper's own design point): clustering caps the
    pairwise work at sum(n_b^2) ~ N^2/k instead of N^2 — pick
    ``n_clusters`` ~ sqrt(N)/c to hold per-cluster membership near
    constant. The KMeans fit runs on a bounded seeded hash-ordered
    sample (``fit_sample``, the ``pq.train_pq_codebooks`` contract) —
    never a full-corpus MLlib iterate — and ``assignments`` skips the
    fit entirely by reusing an EXISTING clustering as a DataFrame of
    (id_col, ivf_bucket), e.g. a persisted ANN index's
    ``<name>__vectors`` table (``ann_index.build_ivf_index``), so one
    clustering serves both search and dedup. The within-cluster
    quadratic verify exchanges the corpus ONCE on the bucket key and
    runs each bucket as a chunked numpy matmul (``applyInPandas``) —
    candidate pairs never exist as rows, only survivors do (see
    ``semantic_near_pairs`` for the measured comparison against the
    two join-based shapes it replaced).
    Components reuse ``dedup.duplicate_clusters`` (keyed label
    propagation, no driver data loop). The documented trade is recall
    at cluster BOUNDARIES: a cross-cluster pair above threshold is not
    examined — the paper accepts this (duplicates land in the same
    cluster with high probability because they are near each other in
    embedding space). Measured fit/pairwise scaling: SCALE.md
    "Round-7".

    ``collapse_exact`` pre-collapses IDENTICAL vectors (one cheap
    groupBy on the vector value, keeping the minimum id per group)
    before clustering, so the quadratic within-cluster work scales
    with DISTINCT vectors instead of corpus rows. An identical family
    of s rows lands in one cluster and alone contributes s*(s-1)/2
    verified pairs — on real corpora (boilerplate, re-crawls) that
    family is the dominant pair mass, and every one of its members is
    a semantic duplicate BY DEFINITION (cosine exactly 1 >= any sane
    threshold), so collapsing first is pure work removal with an
    unchanged result: non-representative members drop with their
    representative's verdict. Default off to keep the historical
    plan.

    Two edges where "unchanged" needs care: (a) ``threshold > 1`` means
    NO pair can qualify, so the collapse is skipped outright rather
    than dropping exact copies the threshold would keep; (b) vectors
    containing NaN are excluded from the collapse — their cosine is
    NaN, which fails every threshold, so the uncollapsed path never
    drops them and the collapsed path must not either. At exactly
    ``threshold == 1.0`` the collapse may drop identical copies whose
    FLOAT cosine rounds just below 1; that is treated as the intended
    reading (mathematically the cosine of byte-identical vectors is 1)."""
    from modelardb_rs_spark.operators.dedup import duplicate_clusters

    if collapse_exact and threshold > 1.0:
        collapse_exact = False
    # NaN-bearing vectors can never be duplicates (their cosine is NaN,
    # failing every threshold) and MLlib KMeans rejects them outright —
    # route them around the clustering; they are always kept.
    has_nan = F.exists(F.col(vec_col), F.isnan)
    work = corpus
    if collapse_exact:
        # ONE scan, one shuffle: non-NaN rows group by vector value;
        # NaN-bearing rows get their own id as a secondary key (Spark
        # groups NaN==NaN, so without it identical NaN vectors would
        # collapse — and their cosine is NaN, so the uncollapsed path
        # keeps them all). Each NaN row is thus its own representative.
        work = (
            corpus.groupBy(
                F.col(vec_col),
                F.when(has_nan, F.col(id_col)).alias("__nan_self__"),
            )
            .agg(F.min(F.col(id_col)).alias(id_col))
            .select(id_col, vec_col)
        )
        # The collapsed frame feeds FIVE independent subtrees (the KMeans
        # fit action, both sides of the candidate self-join, the vector
        # re-attach, the final kept semi-join): persist it so the
        # collapse shuffle runs once, not per branch. The MLlib fit —
        # an eager action — populates the cache before the lazy
        # branches need it. At 100 TB this is the collapsed (id,
        # vector) projection, which is the whole point of collapsing.
        from pyspark import StorageLevel

        work = work.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = semantic_near_pairs(
        work,
        threshold=threshold,
        n_clusters=n_clusters,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        fit_sample=fit_sample,
        assignments=assignments,
        nprobe=nprobe,
        max_bucket_rows=max_bucket_rows,
        auto_chunk_floor=auto_chunk_floor,
        auto_chunk_median_mult=auto_chunk_median_mult,
    )
    drop = (
        duplicate_clusters(pairs)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    if collapse_exact:
        # kept = representatives that survived; every non-representative
        # is an exact duplicate of its representative and drops with it.
        # Materialize kept NOW (ids only — narrow at any scale) with a
        # truncated lineage, then release the cached collapsed frame:
        # a long-lived session calling this repeatedly must not
        # accumulate MEMORY_AND_DISK blocks until shutdown
        # (CacheManager entries are never GC-reclaimed). Same policy as
        # duplicate_clusters: reliable checkpoint files when the
        # session has a checkpoint dir (the Engine default — no memory
        # blocks at all), eager localCheckpoint otherwise. This makes
        # the collapse path eager; the survivor-id job runs exactly
        # once either way.
        from modelardb_rs_spark.operators.dedup import _truncate_lineage

        kept = _truncate_lineage(
            work.join(drop, id_col, "left_anti").select(id_col)
        )
        work.unpersist()
        return corpus.join(kept, id_col, "semi")
    return corpus.join(drop, id_col, "left_anti")
