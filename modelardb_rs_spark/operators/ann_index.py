"""Persisted ANN index: build once, probe many — the 100 TB shape.

``ivf_topk`` (operators/similarity.py) recomputes bucket centroids per
query, which is right for one-shot jobs but wrong for a serving corpus:
at scale the index is built ONCE and every query must touch only the
probed slice of the data. This module persists an IVF index as two
engine tables inside the data folder:

    <index>__vectors    (id, vector, ivf_bucket)  — Hive-partitioned by
                        ivf_bucket, so a probe's IN-filter prunes whole
                        directories at planning time; only the probed
                        buckets' files are ever listed or opened
                        (FAISS reads only the probed inverted lists; this
                        is the Parquet-native equivalent)
    <index>__centroids  (ivf_bucket, centroid, n_vectors) — tiny, always
                        broadcast

Both tables go through the transactional commit log like every other
table: index builds are atomic, rebuilds are snapshot-isolated with
time travel, and VACUUM applies.

Buckets come from a provided column (e.g. a label) or an MLlib-KMeans
coarse quantizer (``similarity.kmeans_buckets``). Probing reuses
``similarity.probe_topk`` so persisted-index results are value-identical
to the in-line pipeline (and to its SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modelardb_rs_spark.operators.similarity import (
    bucket_centroids,
    cosine,
    kmeans_buckets,
    probe_topk,
)


def _vectors_table(index_name: str) -> str:
    return f"{index_name}__vectors"


def _centroids_table(index_name: str) -> str:
    return f"{index_name}__centroids"


def _cached_centroids(engine, index_name: str) -> DataFrame:
    """Centroids as a local-rows DataFrame, cached per engine instance
    and centroid-table VERSION (they're index metadata — n_buckets tiny
    rows). High-QPS probing then runs no centroid-table scan per call:
    freshness costs one commit-log listing, and a rebuild/append bumps
    the version so the cache refills itself."""
    tbl = _centroids_table(index_name)
    snap = engine.folder.log(tbl).snapshot()
    cache = engine.__dict__.setdefault("_ann_centroid_cache", {})
    # keyed by the live FILE SET, not the version number: a drop +
    # rebuild restarts versions at 0 but stages under fresh txn= dirs
    key = (tbl, snap.version, hash(tuple(sorted(snap.paths))))
    if key not in cache:
        for stale in [k for k in cache if k[0] == tbl]:
            del cache[stale]
        rows = [
            (int(r["ivf_bucket"]), list(r["centroid"]))
            for r in engine.table(tbl).select("ivf_bucket", "centroid").collect()
        ]
        cache[key] = rows
    return engine.spark.createDataFrame(
        cache[key], "ivf_bucket INT, centroid ARRAY<FLOAT>"
    )


def build_ivf_index(
    engine,
    index_name: str,
    corpus: DataFrame,
    bucket_col: str | None = None,
    n_buckets: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """Build (or rebuild) a persisted IVF index over ``corpus``.

    ``bucket_col`` uses an existing integer column as the coarse
    quantizer (deterministic, SQL-reproducible); otherwise MLlib KMeans
    learns ``n_buckets`` buckets (seeded). Returns
    ``{"n_vectors", "n_buckets"}``.
    """
    if bucket_col is None:
        bucketed = kmeans_buckets(corpus, k=n_buckets, id_col=id_col, vec_col=vec_col, seed=seed)
        bucket_src = "ivf_bucket"
    else:
        bucketed, bucket_src = corpus, bucket_col
    vectors = bucketed.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(bucket_src).cast("int").alias("ivf_bucket"),
    )
    cents = bucket_centroids(vectors, vec_col, "ivf_bucket").join(
        vectors.groupBy("ivf_bucket").agg(F.count("*").cast("long").alias("n_vectors")),
        "ivf_bucket",
    )

    vt, ct = _vectors_table(index_name), _centroids_table(index_name)
    for t in (vt, ct):
        if t in engine.tables():
            engine.drop(t)
    engine.create_table(vt, f"{id_col} BIGINT, {vec_col} ARRAY<FLOAT>, ivf_bucket INT")
    engine.create_table(ct, "ivf_bucket INT, centroid ARRAY<FLOAT>, n_vectors BIGINT")
    engine.write(vt, vectors, partition_by=["ivf_bucket"])
    # centroids ARE index metadata (n_buckets rows): collect once, write
    # the local rows, and derive the build stats without another scan
    cent_rows = [
        (int(r["ivf_bucket"]), list(r["centroid"]), int(r["n_vectors"]))
        for r in cents.collect()
    ]
    engine.write(
        ct,
        engine.spark.createDataFrame(
            cent_rows, "ivf_bucket INT, centroid ARRAY<FLOAT>, n_vectors BIGINT"
        ),
    )
    return {
        "n_vectors": sum(r[2] for r in cent_rows),
        "n_buckets": len(cent_rows),
    }


def append_to_ivf_index(
    engine,
    index_name: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally grow a persisted index: assign each new vector to
    its nearest EXISTING centroid (no retrain — classic IVF add) and
    append to the partitioned vectors table in one transaction.
    Centroids stay fixed, so every prior probe plan remains valid; they
    drift from the true bucket means as appends accumulate, which is
    the standard IVF trade — rebuild with ``build_ivf_index`` when
    recall sags. Returns ``{"appended"}``."""
    cents = _cached_centroids(engine, index_name)
    w = Window.partitionBy("__id__").orderBy(F.col("__ccos__").desc(), F.col("ivf_bucket"))
    assigned = (
        new_vectors.select(F.col(id_col).alias("__id__"), F.col(vec_col).alias("__v__"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__ccos__", cosine(F.col("__v__"), F.col("centroid")))
        .withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .select(
            F.col("__id__").alias(id_col),
            F.col("__v__").alias(vec_col),
            F.col("ivf_bucket"),
        )
    )
    engine.write(_vectors_table(index_name), assigned, partition_by=["ivf_bucket"])
    return {"appended": new_vectors.count()}


def ivf_index_topk(
    engine,
    index_name: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a persisted index, touching only probed buckets.

    The union of the queries' probe buckets (a handful of ints — index
    metadata, not data) becomes a static IN-filter on the partitioned
    vectors table, so planning prunes every unprobed directory; the
    per-query restriction then rides the same probes join as the inline
    pipeline. Value-identical to ``ivf_topk`` over the same buckets.
    Centroids come from the per-engine cache (_cached_centroids), so
    probe-many workloads never re-scan the centroid table.
    """
    cents = _cached_centroids(engine, index_name)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__ccos__").desc(), F.col("ivf_bucket")
    )
    probed_buckets = [
        r["ivf_bucket"]
        for r in (
            q.crossJoin(F.broadcast(cents))
            .withColumn("__ccos__", cosine(F.col("__qv__"), F.col("centroid")))
            .withColumn("__pr__", F.row_number().over(probe_w))
            .where(F.col("__pr__") <= nprobe)
            .select("ivf_bucket")
            .distinct()
            .collect()
        )
    ]
    vectors = engine.table(_vectors_table(index_name)).where(
        F.col("ivf_bucket").isin(probed_buckets)
    )
    return probe_topk(vectors, cents, queries, k, nprobe, id_col, vec_col, "ivf_bucket")
