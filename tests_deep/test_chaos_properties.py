"""Deep property / chaos tests — the long-running verification layer.

These re-verify invariants the fast suite in tests/ already pins with
cheaper cases: bit-identity of chunked vs single-task near-pair blocks,
reliable-checkpoint survival under simulated block loss, snapshot
isolation under a concurrent write/optimize/vacuum storm, and probe
consistency under racing index rebuilds. Split out of tests/ in round
14 (VERDICT r13 task 2: the driver's pytest budget truncated the full
suite) — run with `python -m pytest tests_deep/ -q`; kept green every
round (see OPTIMIZATION_r14.md "Round-end numbers").
"""

import time

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from modelardb_rs_spark.operators import ann_index
from modelardb_rs_spark.operators import dedup as dedup_ops
from modelardb_rs_spark.operators import similarity as sim_ops
from modelardb_rs_spark.sources.testdata import load_table


@pytest.fixture()
def vectors(spark):
    rng = np.random.default_rng(7)
    rows = []
    for label in range(4):
        center = rng.normal(0, 1, 16)
        for i in range(25):
            v = center + rng.normal(0, 0.1, 16)
            rows.append(
                Row(vec_id=label * 25 + i, embedding=[float(x) for x in v.astype(np.float32)], label=label)
            )
    return spark.createDataFrame(rows)


@pytest.fixture()
def emb(spark):
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_semantic_near_pairs_chunked_matches_single_task(vectors):
    """max_bucket_rows distributes a hot bucket's quadratic verify
    across (chunk_i, chunk_j) tasks — the output must be bit-identical
    to the single-task path (every unordered pair lands in exactly one
    task), including under multi-probe assignment and through
    semantic_dedup's survivor semantics."""
    single = {
        (r.id_a, r.id_b)
        for r in sim_ops.semantic_near_pairs(
            vectors, threshold=0.9, n_clusters=2
        ).collect()
    }
    assert single  # the fixture's tight clusters produce pairs
    for m in (1, 7, 10_000):  # 1 = max chunking, 10k = no bucket splits
        chunked = {
            (r.id_a, r.id_b)
            for r in sim_ops.semantic_near_pairs(
                vectors, threshold=0.9, n_clusters=2, max_bucket_rows=m
            ).collect()
        }
        assert chunked == single, f"max_bucket_rows={m}"
    multi_single = {
        (r.id_a, r.id_b)
        for r in sim_ops.semantic_near_pairs(
            vectors, threshold=0.9, n_clusters=4, nprobe=2
        ).collect()
    }
    multi_chunked = {
        (r.id_a, r.id_b)
        for r in sim_ops.semantic_near_pairs(
            vectors, threshold=0.9, n_clusters=4, nprobe=2, max_bucket_rows=9
        ).collect()
    }
    assert multi_chunked == multi_single
    kept_single = {
        r.vec_id
        for r in sim_ops.semantic_dedup(vectors, threshold=0.9, n_clusters=2).collect()
    }
    kept_chunked = {
        r.vec_id
        for r in sim_ops.semantic_dedup(
            vectors, threshold=0.9, n_clusters=2, max_bucket_rows=8
        ).collect()
    }
    assert kept_chunked == kept_single


def test_duplicate_clusters_survive_block_loss(spark):
    """With a checkpoint directory configured, label propagation uses
    RELIABLE checkpoints: dropping every cached block mid-lifetime
    (simulated executor loss — the failure mode that kills
    localCheckpoint on preemptible clusters) must not lose the result."""
    import glob
    import tempfile

    sc = spark.sparkContext
    ckpt = tempfile.mkdtemp(prefix="smdl_ckpt_")
    sc.setCheckpointDir(ckpt)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
            "id_a long, id_b long",
        )
        labels = dedup_ops.duplicate_clusters(pairs)
        expected = sorted(map(tuple, labels.collect()))
        assert glob.glob(ckpt + "/*/rdd-*")  # reliable checkpoints written
        # simulated loss: every persistent/localCheckpoint block dropped
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
        spark.catalog.clearCache()
        got = sorted(map(tuple, labels.collect()))
        assert got == expected
        assert {c for _, c in got} == {1, 10, 20}
    finally:
        # no unset API: point later tests at a throwaway shared-tmp dir
        sc.setCheckpointDir(tempfile.mkdtemp(prefix="smdl_ckpt_"))


def test_chaos_concurrent_writes_optimize_vacuum_time_travel(engine, spark):
    """Adversarial storm on one normal table: concurrent batch writers,
    a compactor (OPTIMIZE: remove+add commits), a zero-retention VACUUM
    loop, and racing readers. The snapshot-isolation contract under
    aggressive vacuum (reference mod.rs:582-686): every read either
    returns a fully COMMITTED state — all-or-nothing batches, never a
    torn one — or fails cleanly because vacuum already deleted a
    superseded file the resolved snapshot referenced (the documented
    retain=0 hazard, same as Delta's); it must never return partial or
    wrong data. Afterwards the live table holds every batch exactly
    once and every still-readable historical version is also
    batch-consistent."""
    import threading

    engine.create_table("chaos", "w INT, b INT, v BIGINT")
    N_W, N_B, ROWS = 3, 6, 20
    stop = threading.Event()
    errors: list = []
    consistent_reads = [0]
    clean_failures = [0]

    def batch(w, b):
        return spark.range(ROWS).selectExpr(
            f"CAST({w} AS INT) AS w", f"CAST({b} AS INT) AS b", "id AS v"
        )

    def writer(w):
        try:
            for b in range(N_B):
                engine.write("chaos", batch(w, b))
        except Exception as exc:
            errors.append(("writer", exc))

    def compactor():
        try:
            while not stop.is_set():
                engine.folder.optimize("chaos")
                time.sleep(0.05)
        except Exception as exc:
            errors.append(("compactor", exc))

    def vacuumer():
        try:
            while not stop.is_set():
                engine.folder.vacuum("chaos", retain_seconds=0)
                time.sleep(0.03)
        except Exception as exc:
            errors.append(("vacuum", exc))

    def check_consistent(df):
        counts = df.groupBy("w", "b").count().collect()
        for r in counts:
            assert r["count"] == ROWS, f"torn batch ({r['w']},{r['b']}): {r['count']}"
        return len(counts)

    def reader():
        while not stop.is_set():
            try:
                check_consistent(engine.table("chaos"))
                consistent_reads[0] += 1
            except AssertionError as exc:
                errors.append(("reader", exc))
                return
            except Exception:
                # resolved snapshot raced a remove+vacuum: clean failure
                clean_failures[0] += 1
            time.sleep(0.02)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N_W)]
    threads += [
        threading.Thread(target=compactor),
        threading.Thread(target=vacuumer),
        threading.Thread(target=reader),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads[:N_W]:
        t.join()
    stop.set()
    for t in threads[N_W:]:
        t.join()
    assert not errors, errors[:3]
    assert consistent_reads[0] > 0  # the storm didn't just fail every read

    # final state: every batch exactly once, nothing lost or duplicated
    final = engine.table("chaos")
    assert check_consistent(final) == N_W * N_B
    assert final.count() == N_W * N_B * ROWS

    # time travel across the whole history: every version that is still
    # materially readable is batch-consistent; vacuumed ones fail
    # cleanly (missing file), never partially
    schema = final.schema
    history = engine.folder.history("chaos")
    readable = 0
    for h in history:
        try:
            old = engine.folder.read_normal("chaos", schema, version=h["version"])
            n = old.count()
            check_consistent(old)
            assert n % ROWS == 0
            readable += 1
        except AssertionError:
            raise
        except Exception:
            pass  # vacuumed history: clean failure is the contract
    assert readable > 0  # at least the latest version reads back


def test_ivf_probe_consistent_under_concurrent_rebuilds(engine, emb):
    """Chaos: probes racing rebuilds must ALWAYS read a consistent
    vectors/centroids pair. Rebuilds alternate 4- and 8-bucket
    geometries while a probe loop looks up a vector that is IN the
    corpus with nprobe covering EVERY bucket — under any consistent
    snapshot the identical twin is always found at cosine ~1; a torn
    read pairing the 4-bucket centroids with the 8-bucket vectors
    exposes only bucket ids 0-3 to the scan filter, so a twin living
    in buckets 4-7 vanishes and the probe misses (the pre-meta design
    had exactly this window between its two commits)."""
    import threading

    ann_index.build_ivf_index(engine, "czidx", emb, bucket_col=None, n_buckets=4)
    # fresh query id: probe_topk excludes the query's own id, so the
    # exact-match hit must be the STORED row 17
    q = emb.where(F.col("vec_id") == 17).select(
        F.lit(888_888).alias("vec_id"), "embedding"
    )
    stop = threading.Event()
    errors: list = []

    def rebuilder():
        try:
            for i in range(4):
                ann_index.ivf_index_maintenance(
                    engine, "czidx",
                    max_appended_fraction=-1.0,  # always trips
                    n_buckets=8 if i % 2 == 0 else 4,
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=rebuilder)
    t.start()
    probes = 0
    try:
        while not stop.is_set():
            out = ann_index.ivf_index_topk(
                engine, "czidx", q, k=1, nprobe=8
            ).collect()
            assert out and out[0]["neighbor_id"] == 17, out
            assert abs(out[0]["cos"] - 1.0) < 1e-5, out
            probes += 1
    finally:
        t.join()
    assert not errors, errors
    assert probes >= 3  # the loop genuinely overlapped the rebuilds
