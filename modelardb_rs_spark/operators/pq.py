"""Product quantization (PQ) for embedding similarity at 100 TB.

The public PQ construction (Jégou, Douze, Schmid: "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — the FAISS `IndexPQ` shape):
split each D-dim vector into ``m`` contiguous subvectors, learn a
``ks``-centroid codebook per subspace, and store each vector as ``m``
small codes. With m=8, ks=16 a 64-dim float32 embedding compresses
256 bytes → 8 codes (32×), and query scoring never touches the original
vectors: a query precomputes an m×ks lookup table of subspace inner
products once, then every corpus vector scores with ``m`` table lookups
(asymmetric distance computation, ADC).

Spark-first mapping:
- **training** runs seeded numpy Lloyd iterations on a deterministic
  driver sample (lowest ids) — at billions of vectors codebooks are
  always trained on a sample; the loop is over m×ks×iters tiny
  centroids, never the corpus,
- **encoding** is map-only Column algebra: per subspace the ks squared
  distances are literal-folded JVM expressions and the code is the
  argmin index — no Python in the hot path, whole-stage codegen,
- **scoring** broadcasts the per-query lookup tables as literal arrays
  and sums ``m`` `element_at` lookups per (query, vector) pair — the
  corpus side reads ONLY the code columns (column pruning drops the
  raw embeddings entirely), then one window ranks top-k per query.

Recall < 1 by construction; `sim_pq_topk` validates recall floors
against ``brute_force_topk`` with a fixed seed, mirroring the IVF/LSH
entries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 4096,
    iters: int = 10,
    seed: int = 7,
    sample_X: "np.ndarray | None" = None,
) -> list[np.ndarray]:
    """Per-subspace codebooks: ``m`` arrays of shape (ks, D/m).

    Deterministic WITHOUT sample bias: the sample is the ``sample``
    vectors ranked by a seeded hash of their id — same corpus + seed,
    same books — rather than the lowest ids, which correlate with
    content whenever ids are assigned in time/source order (a drifting
    corpus would train books on its oldest slice only). Ties on the
    hash break by id so duplicate hash values stay deterministic.

    ``sample_X`` supplies the training matrix directly (float64, rows
    in the ``_driver_sample`` hash order) and skips the Spark TopK
    collect — callers that already hold the sample (an IVF-PQ build's
    coarse-fit sample covers the codebook sample as a prefix) save a
    full corpus pass. Values must be BIT-IDENTICAL to what
    ``_driver_sample`` would return: the fit is exactness-pinned."""
    X = sample_X if sample_X is not None else _driver_sample(
        corpus, id_col, vec_col, sample, seed
    )
    if X.shape[1] % m:
        raise ValueError(f"dimension {X.shape[1]} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    return _fit_books(X, m, ks, iters, rng)


def _driver_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample: int, seed: int
) -> np.ndarray:
    """The seeded-hash driver sample shared by PQ and OPQ training —
    one sampler so the two trainers see the SAME rows for the same
    (corpus, seed)."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(sample)
        .collect()
    )
    return np.asarray([list(r[1]) for r in rows], dtype=np.float64)


def _fit_books(
    X: np.ndarray,
    m: int,
    ks: int,
    iters: int,
    rng: np.random.Generator,
    books: list[np.ndarray] | None = None,
) -> list[np.ndarray]:
    """Per-subspace Lloyd fit shared by train_pq_codebooks and
    train_opq's alternation: seeded-choice init when ``books`` is None
    (one rng.choice per subspace, in subspace order — the rng stream
    train_pq_codebooks has always consumed), warm start otherwise;
    empty clusters keep their previous centroid."""
    sub_d = X.shape[1] // m
    out: list[np.ndarray] = []
    for s in range(m):
        Xs = X[:, s * sub_d : (s + 1) * sub_d]
        if books is None:
            C = Xs[rng.choice(len(Xs), size=min(ks, len(Xs)), replace=False)].copy()
        else:
            C = books[s].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(len(C)):
                pts = Xs[assign == j]
                if len(pts):
                    C[j] = pts.mean(0)
        out.append(C)
    return out


def _encode_np(X: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """(n, m) int32 codes for float64 rows X — the one argmin-encode
    routine, shared by the OPQ training loop (driver sample) and the
    distributed ``encode_pq`` batch function. Ties break to the lowest
    code (numpy argmin returns the first minimum)."""
    m = len(books)
    sub_d = books[0].shape[1]
    codes = np.empty((len(X), m), dtype=np.int32)
    for s in range(m):
        S = X[:, s * sub_d : (s + 1) * sub_d]
        d2 = ((S[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def _decode_np(codes: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """Reconstruct (n, D) float64 rows from (n, m) codes."""
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(len(books))], axis=1
    )


def train_opq(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 4096,
    opq_iters: int = 10,
    lloyd_iters: int = 4,
    iters: int = 10,
    seed: int = 7,
    sample_X: "np.ndarray | None" = None,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Optimized product quantization (Ge, He, Ke, Sun: "Optimized
    Product Quantization", CVPR 2013 — the FAISS ``OPQMatrix`` shape):
    learn an ORTHONORMAL rotation ``R`` (D x D) jointly with the
    codebooks so that PQ quantizes ``x @ R`` instead of ``x``, then
    return ``(R, books)`` for ``encode_pq(..., rotate=R)`` /
    ``pq_topk(..., rotate=R)``.

    Why it composes with the whole ADC stack unchanged: R is
    orthonormal, so it preserves inner products and norms —
    ``(x @ R) . (q @ R) = x . q`` — which means ADC scores computed in
    the rotated space approximate the ORIGINAL cosine, and ``pq_norm``
    of a rotated reconstruction estimates the original norm. The win is
    recall per byte: plain PQ quantizes each contiguous subspace
    independently, so variance that straddles subspace boundaries (or
    concentrates in a few correlated dimensions — the usual shape of
    learned embeddings) is quantized badly; the rotation redistributes
    it so every subspace carries quantizable structure. Same code size,
    same query cost, strictly more preparation.

    Training is the paper's non-parametric alternation, run in numpy on
    the same seeded-hash driver sample ``train_pq_codebooks`` uses
    (never the corpus): rotate -> refresh codebooks (warm-started Lloyd)
    -> reconstruct -> orthogonal Procrustes (SVD of ``X^T X_rec``,
    ``R = U V^T``) -> repeat ``opq_iters`` times, then a final
    ``iters``-iteration codebook fit at the converged rotation. All
    numpy ops are deterministic for a fixed seed, so the same corpus
    always yields the same (R, books).

    Scale envelope: the rotation's executor-ship cost is handled —
    below 8 MB it rides the encode closure (64-dim: 32 KB); above,
    ``_ship_rotation`` moves it to a Spark broadcast, as float32 when
    the round-trip is lossless (it is, for every consumer that stores R
    in the ARRAY<FLOAT> pqbooks table), so a 4k-8k-dim rotation costs
    one 64-256 MB per-executor fetch instead of a per-task closure
    copy. The alternation itself is sample x D and never touches the
    corpus.

    ``sample_X`` supplies the training matrix directly (same contract
    as ``train_pq_codebooks``): bit-identical to the ``_driver_sample``
    rows, in hash order — the IVF-PQ build derives the residual sample
    from its coarse-fit sample driver-side and skips this function's
    corpus TopK pass entirely."""
    X = sample_X if sample_X is not None else _driver_sample(
        corpus, id_col, vec_col, sample, seed
    )
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dimension {d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    # random orthonormal init (QR of a seeded gaussian): identity can
    # sit at a symmetric saddle of the alternation on isotropic data
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    R = Q

    books = None
    for _ in range(opq_iters):
        Y = X @ R
        books = _fit_books(Y, m, ks, lloyd_iters, rng, books)
        recon = _decode_np(_encode_np(Y, books), books)
        # orthogonal Procrustes: argmin_R ||X R - recon||_F over
        # orthonormal R has the closed form U V^T from X^T recon
        U, _, Vt = np.linalg.svd(X.T @ recon)
        R = U @ Vt
    books = _fit_books(X @ R, m, ks, iters, rng, books)
    return R, books


# Rotation matrices above this many bytes ship to executors as a Spark
# broadcast (fetched once per executor, torrent-distributed) instead of
# riding every task's pickled closure; see _ship_rotation.
_ROTATION_SHIP_CAP = 8 << 20


def _ship_rotation(spark, R64: "np.ndarray | None"):
    """Bound the executor-ship cost of an OPQ rotation (guide §4.1: you
    control how many bytes cross to the workers). Returns
    ``(local, broadcast)`` — exactly one is non-None when a rotation
    exists. Small rotations stay in the closure (``local``); above
    ``_ROTATION_SHIP_CAP`` the matrix ships as a Spark broadcast, and —
    when the float32 round-trip is lossless, which it always is for
    rotations from ``build_ivfpq_index``/``train_opq`` consumers since
    those round-trip R through the ARRAY<FLOAT> storage contract before
    any encode — it ships as float32, halving the bytes. A rotation
    whose float64 values do NOT survive the round-trip broadcasts at
    float64: value identity is never traded for ship size. Workers
    upcast back to float64 before use, so results are bit-identical to
    the closure path either way. At D=8192 this turns a 512 MB
    per-closure copy into one 256 MB per-executor fetch."""
    if R64 is None:
        return None, None
    if R64.nbytes <= _ROTATION_SHIP_CAP:
        return R64, None
    R32 = R64.astype(np.float32)
    ship = R32 if np.array_equal(R32.astype(np.float64), R64) else R64
    return None, spark.sparkContext.broadcast(ship)


def _rotation_value(R_local, R_bc):
    """The float64 rotation inside a worker, whichever way it shipped."""
    if R_bc is not None:
        return np.asarray(R_bc.value, dtype=np.float64)
    return R_local


def encode_pq(
    corpus: DataFrame,
    books: list[np.ndarray],
    vec_col: str = "embedding",
    recon_norm_base: str | None = None,
    rotate: np.ndarray | None = None,
) -> DataFrame:
    """Append ``pq_codes`` (array<int>, one code per subspace) and
    ``pq_norm``. Ties in subspace distance break to the lowest code
    (numpy argmin returns the first minimum) for determinism.

    Code stability contract: codes are deterministic WITHIN one encoder
    version (same input, same codebooks -> same codes), but NOT across
    encoder implementations — this numpy form computes exact float64
    subspace distances with numpy's summation order, where the retired
    Column form rounded distances to 1e-9 before the argmin, so a
    residual sitting within ~1e-9 of a two-centroid tie can encode
    differently than it did under the old encoder. Appending to an
    index built by a different encoder version is still CORRECT (ADC
    distances differ by at most the tie gap) but not byte-identical;
    rebuild the index when byte-level reproducibility across versions
    matters.

    One numpy pass per Arrow batch (``mapInPandas``, codebooks in the
    UDF closure): the previous Column-algebra form evaluated m x ks
    interpreted ``zip_with``/``aggregate`` subspace distances per ROW
    (~13 ms/row at m=8, ks=16 — SCALE.md "Round-9" measures the
    CodegenFallback cost class), and encoding is a full-corpus pass in
    every index build. All input columns pass through unchanged.

    ``pq_norm`` default: the reconstructed vector's L2 norm
    ``sqrt(sum_s |c_{s,code_s}|^2)`` (subspaces orthogonal). With
    ``recon_norm_base=<col>`` (an array column, e.g. the IVF bucket
    centroid the residual was taken against) it is the EXACT
    ``|base + decode(codes)|`` — computed in the same batch pass,
    replacing the separate interpreted full-D dot the IVF-PQ build
    used to pay per row.

    ``rotate=R`` (from ``train_opq``) encodes ``v @ R`` instead of
    ``v`` — the OPQ path. The base column rotates too when
    ``recon_norm_base`` is set, so the reconstructed norm stays the
    ORIGINAL-space estimate (orthonormal R preserves norms:
    ``|base + r| = |base @ R + r @ R|``). Small R rides the closure;
    above 8 MB it ships via ``_ship_rotation`` as a (float32, when
    lossless) Spark broadcast — bit-identical codes either way (see
    train_opq's scale envelope)."""
    import pandas as pd

    from pyspark.sql import types as T

    m = len(books)
    books64 = [np.asarray(b, dtype=np.float64) for b in books]
    R_local, R_bc = _ship_rotation(
        corpus.sparkSession, None if rotate is None else np.asarray(rotate, dtype=np.float64)
    )
    cent_norms_sq = [(b ** 2).sum(axis=1) for b in books64]
    out_schema = T.StructType(
        list(corpus.schema.fields)
        + [
            T.StructField("pq_codes", T.ArrayType(T.IntegerType()), False),
            T.StructField("pq_norm", T.DoubleType(), False),
        ]
    )

    def fn(batches):
        R64 = _rotation_value(R_local, R_bc)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            if R64 is not None:
                V = V @ R64
            n = len(V)
            codes = _encode_np(V, books64)
            if recon_norm_base is not None:
                dec = _decode_np(codes, books64)
                base = np.stack(pdf[recon_norm_base].to_numpy()).astype(
                    np.float64, copy=False
                )
                if R64 is not None:
                    base = base @ R64
                recon = base + dec
                norms = np.sqrt((recon * recon).sum(axis=1))
            else:
                nsq = np.zeros(n)
                for s in range(m):
                    nsq += cent_norms_sq[s][codes[:, s]]
                norms = np.sqrt(nsq)
            out = pdf.copy()
            out["pq_codes"] = list(codes)
            out["pq_norm"] = norms
            yield out

    return corpus.mapInPandas(fn, out_schema)


def query_lut(books: list[np.ndarray], qv: np.ndarray) -> list[float]:
    """Flattened m x ks ADC lookup table for one query: subspace inner
    products q_s . c_{s,j}. Shared by the flat PQ scan and the IVF-PQ
    composition (there the SAME query-only table serves every probed
    bucket, because q.(c_b + r) = q.c_b + q.r splits the bucket term
    out as a per-(query, bucket) scalar)."""
    m = len(books)
    ks = books[0].shape[0]
    sub_d = books[0].shape[1]
    return [
        float(qv[s * sub_d : (s + 1) * sub_d] @ books[s][j])
        for s in range(m)
        for j in range(ks)
    ]


def adc_inner_product(books: list[np.ndarray]) -> "F.Column":
    """Column: sum of the m LUT lookups selected by ``pq_codes`` —
    expects ``__lut__`` (array<double>, from query_lut) and
    ``pq_codes`` in scope."""
    m = len(books)
    ks = books[0].shape[0]
    ip = F.lit(0.0)
    for s in range(m):
        ip = ip + F.element_at(
            F.col("__lut__"), F.lit(s * ks) + F.element_at("pq_codes", s + 1) + 1
        )
    return ip


def pq_topk(
    encoded: DataFrame,
    books: list[np.ndarray],
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
    max_queries: int | None = None,
    rotate: np.ndarray | None = None,
) -> DataFrame:
    """Approximate cosine top-k via ADC over PQ codes.

    Queries collect driver-side (few — the broadcast-queries shape of
    brute_force_topk), bounded by ``max_queries`` (default
    ``similarity.MAX_COLLECTED_QUERIES``; over-limit raises — see
    ``collect_query_rows``); each gets an m×ks inner-product lookup
    table shipped as one literal array. The corpus side reads ONLY
    (id, pq_codes, pq_norm): scoring is m `element_at` lookups per
    pair, then one per-query window ranks. Output matches
    brute_force_topk: (query_id, neighbor_id, cos, rank) with cos the
    PQ-approximated cosine.

    ``rerank=N`` adds the standard exact re-ranking stage (FAISS's
    refine step): ADC selects an N-candidate shortlist per query, then
    TRUE cosine ranks only those N rows — the raw vectors are read for
    |Q|·N rows instead of the whole corpus, trading a sliver of I/O for
    near-exact recall.

    ``rotate=R`` scores an OPQ index (codes from
    ``encode_pq(..., rotate=R)``): each query rotates driver-side
    before its LUT — ``(x @ R) . (q @ R) = x . q`` for orthonormal R,
    so the ADC score still approximates the ORIGINAL cosine and the
    exact re-rank stage (raw, unrotated vectors) is untouched. Query
    norms are taken pre-rotation (rotation preserves them)."""
    from modelardb_rs_spark.operators.similarity import collect_query_rows

    qrows = collect_query_rows(queries, id_col, vec_col, max_queries)
    spark = encoded.sparkSession
    R64 = None if rotate is None else np.asarray(rotate, dtype=np.float64)
    lut_rows = []
    for r in qrows:
        qv = np.asarray(list(r[1]), dtype=np.float64)
        qn = float(np.sqrt((qv**2).sum()))
        if R64 is not None:
            qv = qv @ R64
        lut_rows.append((int(r[0]), qn, query_lut(books, qv)))
    luts = spark.createDataFrame(
        lut_rows, "query_id long, __qn__ double, __lut__ array<double>"
    )
    c = encoded.select(
        F.col(id_col).alias("neighbor_id"), "pq_codes", "pq_norm"
    )
    ip = adc_inner_product(books)
    scored = (
        c.crossJoin(F.broadcast(luts))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            # try_divide: a zero-norm query yields NULL, which ranked_topk
            # drops — the shared degenerate-vector policy (and ANSI mode
            # would otherwise throw DIVIDE_BY_ZERO)
            F.round(
                F.try_divide(
                    ip, F.col("__qn__") * F.greatest(F.col("pq_norm"), F.lit(1e-12))
                ),
                6,
            ),
        )
    )
    from modelardb_rs_spark.operators.similarity import ranked_topk

    # corpus-sized scored set: ranked_topk plans as a two-phase rank
    # limit (partial map-side top-k, tiny exchange) — see its docstring
    shortlist = ranked_topk(scored, rerank or k)
    if rerank is None:
        return shortlist
    # exact re-rank of the shortlist only: |Q|·rerank raw-vector rows
    from modelardb_rs_spark.operators.similarity import dot, norm

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        norm(F.col(vec_col)).alias("__qn2__"),
    )
    cv = encoded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        norm(F.col(vec_col)).alias("__cn2__"),
    )
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "cos",
            F.round(
                F.try_divide(
                    dot(F.col("__qv__"), F.col("__cv__")),
                    F.col("__qn2__") * F.col("__cn2__"),
                ),
                6,
            ),
        )
    )
    return ranked_topk(exact, k)
