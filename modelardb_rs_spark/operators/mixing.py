"""Corpus mixing and training-order operators: deterministic domain
re-weighting (up/down-sampling to target proportions) and hash-sharded
global shuffle — the last-mile steps of a pre-training data pipeline,
downstream of cleaning/dedup and upstream of sequence packing.

Everything here is hash-deterministic (md5 over ids, no RNG state), so
outputs are stable across runs, partitionings, and engines — the same
contract as ``text.deterministic_sample`` / ``packing.stratified_sample``
and the property that makes exact DuckDB oracles possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(*cols, salt: str = "", mod: int = 1_000_000):
    """First 8 md5 hex chars of the ':'-joined inputs as a long in
    [0, mod) — the cross-engine-reproducible uniform hash used by every
    sampling decision in this module (DuckDB computes the identical
    value via CAST('0x'||substr(md5(..),1,8) AS BIGINT))."""
    key = F.concat_ws(":", *[c.cast("string") for c in cols], F.lit(salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % mod


def normalized_weights(weights: dict[str, float]) -> dict[str, float]:
    """Validate and normalize a domain-weight dict to sum ~1 in Python
    doubles — the SINGLE place mixture weights are normalized, so the
    Spark plan and any cross-engine oracle can both inject identical
    double literals (``repr`` of these values round-trips exactly) and
    stay bit-identical through the keep-decision boundary."""
    if not weights:
        raise ValueError("weights must be non-empty")
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    sumw = float(sum(weights.values()))
    if sumw <= 0:
        raise ValueError("weights must sum to a positive value")
    return {k: float(v) / sumw for k, v in weights.items()}


def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    target_total: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Resample the corpus so each stratum's share matches ``weights``
    — the mixture-building step of a pre-training pipeline (the public
    Pile/Dolma recipes express their corpus as exactly this: domain →
    target proportion, with scarce domains repeated for multiple epochs
    and abundant ones subsampled).

    Each stratum ``s`` gets a replication factor
    ``f_s = (w_s / sum(w)) * T / count_s`` where ``T`` is
    ``target_total`` (default: the input row count, so the output is
    the same size re-proportioned). Rows are kept ``floor(f_s)`` whole
    epochs plus one fractional epoch with probability ``frac(f_s)``,
    decided by a per-(row, epoch) hash — so ``f_s = 2.3`` means every
    row appears twice and ~30% of rows a third time, and the expected
    stratum share is exactly ``w_s``. Strata absent from ``weights``
    are dropped (weight 0).

    Output: the input columns plus ``epoch`` (int, 0-based replica
    index) — downstream shuffling treats each (row, epoch) as an
    independent training example.

    Scale shape: one tiny per-stratum count aggregate (map-side
    combine, |strata| rows) broadcast-joined back, then a map-only
    ``explode(sequence(...))`` whose output is exactly the kept
    replicas — no shuffle of the corpus itself, no driver action at
    plan time. When ``target_total`` is given, the corpus-count
    aggregate is skipped entirely (the literal replaces it).

    Cross-engine determinism: weights are normalized ONCE here in
    Python doubles (``normalized_weights``); the plan then computes
    ``w_norm * T / count`` left-to-right in doubles. An exact oracle
    must inject the SAME normalized double literals (``repr(w)``
    round-trips exactly) and the same operation order — dividing raw
    weights by sum(w) inside the other engine can differ in the last
    ulp (e.g. 0.6+0.3+0.1 sums to 0.9999999999999999) and flip
    keep-decisions at the ``hash < frac*1e6`` boundary.
    """
    norm = normalized_weights(weights)

    wt = F.lit(0.0)
    for k, v in norm.items():
        wt = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(wt)

    counts = df.groupBy(strata_col).agg(F.count("*").alias("__cnt__"))
    if target_total is None:
        # the corpus total is the SUM of the per-stratum counts: derive
        # it with a window over the |strata|-row counts frame instead of
        # a second corpus-wide aggregate — the former shape re-executed
        # the ENTIRE upstream plan a third time for the total (an
        # expensive chain upstream, e.g. the dedup window in
        # doc_train_pipeline, ran once per branch; see
        # plans/r13/doc_train_pipeline_before.txt nodes 44-58). Exact
        # same long value, same cast, same arithmetic order.
        counts = counts.withColumn(
            "__tot__", F.sum("__cnt__").over(Window.partitionBy())
        )
        tot_col = F.col("__tot__").cast("double")
    else:
        tot_col = F.lit(float(int(target_total)))
    joined = df.join(F.broadcast(counts), strata_col)

    with_f = joined.withColumn(
        "__f__", wt * tot_col / F.col("__cnt__").cast("double")
    ).where(F.col("__f__") > 0)
    reps = F.floor(F.col("__f__")).cast("int")
    frac = F.col("__f__") - F.floor(F.col("__f__"))
    # long-vs-double comparison on purpose: casting the threshold to a
    # long would TRUNCATE in Spark but ROUND in DuckDB — promoting the
    # hash to double keeps the keep-decision bit-identical across engines
    keep_frac = _hash_bucket(F.col(id_col), F.col("epoch"), salt=salt) < (
        frac * 1_000_000
    )
    return (
        with_f.withColumn(
            "epoch",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.ceil("__f__").cast("int") - 1, F.lit(0))
                )
            ),
        )
        .where((F.col("epoch") < reps) | keep_frac)
        .drop("__cnt__", "__tot__", "__f__")
    )


def temperature_weights(
    df: DataFrame,
    alpha: float,
    strata_col: str = "source",
) -> dict[str, float]:
    """Temperature-scaled mixture weights from the corpus's own
    stratum sizes — the multilingual/multi-domain sampling rule
    (mT5 / XLM-R: p_s ∝ |s|^alpha): ``alpha = 1`` keeps natural
    proportions, ``alpha = 0`` gives uniform strata, and values in
    between upsample low-resource strata smoothly. Feed the result to
    ``domain_mix`` to materialize the resampled corpus.

    One tiny per-stratum count aggregate collected to the driver
    (|strata| rows — mixture metadata, like domain_mix's own count
    join). DETERMINISM CONTRACT: powers and the normalizing sum run in
    SORTED-KEY order, left to right, in python doubles — a SQL oracle
    replays the identical arithmetic by summing the per-stratum powers
    with the same explicit association order (see doc_temperature_mix),
    because a float sum over strata is order-sensitive in the last ulp
    and domain_mix's keep-decision boundary is exact."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    # NULL strata are dropped, matching domain_mix's drop-unknown-strata
    # behavior (and a None key would make the sorted-key association
    # order below raise an opaque TypeError against str keys)
    counts = {
        r[0]: int(r[1])
        for r in df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count("*").alias("c"))
        .collect()
    }
    if not counts:
        raise ValueError("corpus has no strata")
    pw = {k: float(counts[k]) ** float(alpha) for k in sorted(counts)}
    tot = 0.0
    for k in sorted(pw):
        tot += pw[k]
    return {k: pw[k] / tot for k in sorted(pw)}


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``k`` rows — the
    Efraimidis & Spirakis (2006) A-Res scheme: each row draws a
    deterministic uniform ``u`` from the md5 of its id (+salt) and is
    ranked by ``ln(u) / w`` descending (the monotone-equivalent of the
    paper's ``u^(1/w)`` key); the top ``k`` keys ARE a weighted sample
    without replacement. The quality-weighted data-selection primitive:
    weight by a quality score to upsample good documents, by token
    count to sample proportional to training mass, etc.

    Like ``deterministic_sample`` this is reproducible across runs,
    partitionings, and engines (md5 is the portable hash; the exact SQL
    oracle replays key and rank), and different salts draw independent
    samples. One honest caveat: ``ln`` is the module's first
    transcendental on a value-checked path — the JVM's Math.log is
    1-ulp-accurate while other engines use correctly-rounded libm, so
    two keys agreeing to ~1e-16 RELATIVE could in principle order
    differently across engines. Distinct md5-derived u's make adjacent
    key gaps ~1e-3 relative in practice, so the boundary is unreachable
    without a 32-bit hash collision at equal weight; documented rather
    than rounded away because any fixed decimal rounding would collapse
    the small-|key| (high-weight) end of the range. Scale shape: the key is map-only Column algebra and the
    selection is ``orderBy(key).limit(k)``, which Spark plans as
    TakeOrderedAndProject — each partition forwards only its k best
    rows, no global sort, no single-partition window. Rows with NULL or
    non-positive weight are excluded (zero-weight rows are never
    sampled; negative weights are undefined under A-Res).

    Returns the selected rows with ``sample_order`` (1..k in key-rank
    order, ties by id) appended."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / 4294967296.0
    lkey = F.log(u) / F.col(weight_col).cast("double")
    picked = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey__", lkey)
        .orderBy(F.col("__wkey__").desc(), F.col(id_col))
        .limit(int(k))
    )
    # rank the k survivors (bounded set — this window is k rows, not
    # corpus-sized; the heavy selection already happened in the limit)
    w = Window.orderBy(F.col("__wkey__").desc(), F.col(id_col))
    return picked.withColumn("sample_order", F.row_number().over(w)).drop("__wkey__")


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    every row gets a ``shard`` (hash of its id, so shard sizes are
    binomially equal) and a ``pos`` (its 0-based rank within the shard
    under md5 order) — the standard "shuffle once at write time" layout
    where readers stream shards sequentially and the hash order IS the
    global shuffle.

    Scale shape: the rank window partitions BY SHARD, so the sort
    parallelizes across shards (pick n_shards ≈ a small multiple of the
    cluster's cores and no shard outgrows a task); there is never a
    single-partition global window. One shuffle on the shard key, which
    the write needs anyway to lay shards out contiguously. Changing
    ``salt`` gives an independent reshuffle for the next training run.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = _hash_bucket(F.col(id_col), salt=salt, mod=n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("__key__", id_col)
    return (
        df.withColumn("__key__", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("__key__")
    )
