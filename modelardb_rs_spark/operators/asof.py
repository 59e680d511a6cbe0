"""As-of (temporal) join — an operator Spark lacks natively.

The reference system also lacks it (SURVEY.md §2.4: not in DataFusion's
exposed SQL there), but it is the bread-and-butter temporal operator a
time-series engine should offer, so it is provided as a first-class
composition of built-in ops.

Strategy (scalable, no per-group pandas): union both sides tagged with a
side marker, then one window pass per key ordered by (time, side) takes
``last(right_value, ignorenulls=True)`` over the preceding rows — each
left row picks up the most recent right row with ``right.ts <= left.ts``.
Cost: one shuffle on the key + one sort, identical to a sort-merge join.

Skew bound, stated honestly: AQE's skew mitigation splits oversized
JOIN partitions, but this plan's exchange feeds a WINDOW, which AQE
does not split — a single hot key serializes its entire group into one
task's sort. That is the same asymptotic hot-key bound a sort-merge
join has (its matching key also lands on one task), and the sort is
external (spills, never OOMs), but wall-clock degrades to the hot
key's size. For pathological keys (one key ~ the whole input), pass
``hot_key_buckets=N`` (or ``"auto"``, which engages the lever from one
exact key-histogram aggregate when the largest key exceeds the
measured crossover): the time axis splits into N contiguous ranges,
the window runs per (key, time_bucket) — the hot key's rows then
parallelize across N tasks — and each bucket is seeded with the
previous buckets' LAST right row (a per-(key, bucket) max_by plus one
tiny per-key window over at most N bucket rows), so every left row
still sees matches from earlier buckets. Value-identical to the
one-pass plan (fuzzed, including the 95%-hot-key case); costs one
extra min/max job and two small aggregates. Measured crossover
(scripts/scale_probe_asof_hotkey.py, 100%-hot-key corpus, local[32],
N=32): the fixed overhead loses below ~1M hot rows (250k: 0.73 vs
1.27 s), the plans break even between 1M and 4M, and the split wins
growing with size beyond that (4M: 2.33 -> 1.26 s, 1.85x; 16M:
8.18 -> 2.50 s, 3.3x) — leave it off until one key carries millions
of rows. An optional tolerance drops matches older than
``tolerance_us``.

(Contrast with the common ``applyInPandas``+``pd.merge_asof`` recipe:
that materializes each key group in one Python worker — this stays
JVM-side and streams.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_and_seed(
    u: DataFrame,
    on: str,
    by: list[str],
    carried_cols: list[str],
    n_buckets: int,
) -> DataFrame:
    """The first pass of the two-pass hot-key as-of: split the time axis
    into ``n_buckets`` contiguous ranges (one tiny min/max job fixes the
    boundaries) and inject, for every (key, bucket), a SEED right row
    summarizing all earlier buckets for that key. Seeds keep a real
    ``on`` value — strictly before their bucket's range — so the second
    pass's ordering, strict-tie, and tolerance logic apply to them
    unchanged.

    The seed is built PER CARRIED COLUMN with last-non-null semantics,
    exactly mirroring the one-pass plan's ``last(c, ignorenulls=True)``:
    each column's seed value is the latest NON-NULL occurrence among
    earlier right rows (``max_by`` over rows where that column is
    non-null, then a per-column last-non-null across bucket summaries),
    while the seed's ``on`` value is the latest right row's timestamp
    regardless of null payloads — the value ``__right_ts__`` (and thus
    the tolerance gate) sees in the one-pass plan. A single whole-row
    ``max_by`` seed would instead carry a NULL when the latest right
    row happens to hold NULL in one column, silently diverging from
    the one-pass plan wherever carried columns are nullable.

    Cost shape: one per-(key, bucket) aggregate (map-side combinable),
    a distinct over (key, bucket) pairs, and one per-key window over at
    most ``n_buckets`` rows — all metadata-sized relative to the
    input."""
    if dict(u.dtypes)[on].startswith("timestamp"):
        t_num = F.unix_micros(F.col(on)).cast("double")
    else:
        t_num = F.col(on).cast("double")
    u = u.withColumn("__tnum__", t_num)
    rng = u.agg(F.min("__tnum__").alias("mn"), F.max("__tnum__").alias("mx")).first()
    if rng["mn"] is None or rng["mx"] == rng["mn"]:
        # empty input or a single timestamp: one bucket, no seeds needed
        return u.withColumn("__b__", F.lit(0)).drop("__tnum__")
    width = (rng["mx"] - rng["mn"]) / n_buckets
    b = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("__tnum__") - F.lit(rng["mn"])) / F.lit(width)).cast("int"),
        ),
    ).cast("int")
    u = u.withColumn("__b__", b).drop("__tnum__")
    rights = u.where(F.col("__side__") == 0)
    # per-bucket summary: the bucket's latest right timestamp, plus —
    # per carried column — the value of the bucket's latest right row
    # where THAT column is non-null (max_by ignores rows whose ordering
    # expression is NULL, so null payloads are skipped, matching the
    # one-pass window's ignorenulls carry)
    aggs = [F.max(F.col(on)).alias("__on__")]
    for c in carried_cols:
        aggs.append(
            F.max_by(
                F.col(c), F.when(F.col(c).isNotNull(), F.col(on))
            ).alias(c)
        )
    bucket_last = rights.groupBy(*by, "__b__").agg(*aggs)
    # every (key, bucket) that EXISTS needs a seed — including buckets
    # holding only left rows, which bucket_last alone would miss.
    # NULL-SAFE key equality: the one-pass window puts NULL keys in one
    # partition group and carries values within it, so the seed join
    # must match NULL keys too — a plain equi-join (NULL != NULL) would
    # silently drop every NULL-key seed and diverge from the one-pass
    # plan exactly when "auto" engages on a NULL hot key
    kb = u.select(*by, "__b__").distinct()
    bl = bucket_last
    for c in by:
        bl = bl.withColumnRenamed(c, f"__blk_{c}__")
    bl = bl.withColumnRenamed("__b__", "__blk_b__")
    cond = [kb[c].eqNullSafe(bl[f"__blk_{c}__"]) for c in by]
    cond.append(kb["__b__"] == bl["__blk_b__"])  # __b__ is computed, never NULL
    wseed = (
        Window.partitionBy(*[kb[c] for c in by])
        .orderBy(kb["__b__"])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # cumulative across earlier buckets: buckets are time-ordered, so
    # the last bucket summary with a non-null value for a column holds
    # the globally-latest non-null value for that column
    seeds = (
        kb.join(bl, cond, "left")
        .select(
            *[kb[c] for c in by],
            kb["__b__"],
            F.last("__on__", ignorenulls=True).over(wseed).alias(on),
            *[
                F.last(F.col(c), ignorenulls=True).over(wseed).alias(c)
                for c in carried_cols
            ],
        )
        .where(F.col(on).isNotNull())
    )
    seed_rows = seeds.withColumn("__side__", F.lit(0))
    return u.unionByName(seed_rows, allowMissingColumns=True)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_value_cols: list[str],
    tolerance_us: int | None = None,
    suffix: str = "_right",
    strict: bool = False,
    match_ts_col: str | None = None,
    hot_key_buckets: int | str | None = None,
    hot_key_threshold: int = 2_000_000,
) -> DataFrame:
    """For every left row, attach the most recent right row (same ``by``
    keys, ``right.on <= left.on``). ``on`` must be the same column name
    on both sides (timestamp or numeric).

    ``strict=True`` uses ``right.on < left.on`` (an exactly concurrent
    right row is NOT visible — DuckDB's ``>`` match condition).
    ``match_ts_col`` additionally outputs the matched right row's ``on``
    value under that name (NULL when no match) — the column an INNER
    as-of join filters on.

    ``hot_key_buckets=N`` parallelizes a pathological hot key (one key
    ~ the whole input) across N tasks: the time axis splits into N
    contiguous ranges, each (key, bucket) windows independently, and a
    seed row — summarizing all EARLIER buckets for that key with
    per-column last-non-null semantics — is injected at each bucket's
    start so carried values cross bucket boundaries. The seed's time is
    a REAL right timestamp (strictly before the bucket's range), so
    strict/non-strict tie handling and the tolerance arithmetic are
    untouched. Value-identical to the default one-pass plan wherever
    right timestamps are unique per key (among EQUAL right timestamps
    both plans pick an arbitrary row, as any as-of must); costs one
    min/max job plus two small aggregates. The ``on`` axis must be
    NON-NULL on both sides: a NULL time has no place on a time axis,
    and the two plans disagree on it (the one-pass window happens to
    sort NULL first and carry its value, the bucketed plan's max_by
    skips it) — filter NULLs out first.

    ``hot_key_buckets="auto"`` makes the lever a POLICY: one exact
    key-histogram aggregate (groupBy(by).count() -> max, map-side
    combinable so shuffle volume is distinct keys, not rows) engages
    the two-pass plan only when the largest key exceeds
    ``hot_key_threshold`` rows — default 2M, the midpoint of the
    measured 1M-4M crossover (scripts/scale_probe_asof_hotkey.py;
    below ~1M the fixed overhead loses, above ~4M the split wins
    growing with size). When it engages, N = defaultParallelism
    clamped to [8, 256] (the measurement used N=32 at local[32] —
    bucket count should track cluster parallelism, not data size,
    since each bucket is one window task). The detection aggregate
    costs one extra scan of the unioned input — cheap next to the
    window it avoids when hot, wasted when uniform; pass an explicit
    int (or None) when the key distribution is already known."""
    l = left.withColumn("__side__", F.lit(1))
    r = right.select(
        *by, on, *[F.col(c).alias(c + suffix) for c in right_value_cols]
    ).withColumn("__side__", F.lit(0))
    all_cols = set(l.columns) | set(r.columns)
    l = l.select(*[F.col(c) if c in l.columns else F.lit(None).alias(c) for c in all_cols])
    r = r.select(*[F.col(c) if c in r.columns else F.lit(None).alias(c) for c in all_cols])
    u = l.unionByName(r)

    if isinstance(hot_key_buckets, str):
        if hot_key_buckets != "auto":
            raise ValueError(
                f"hot_key_buckets must be an int, None, or 'auto', got {hot_key_buckets!r}"
            )
        mx = (
            u.groupBy(*by)
            .count()
            .agg(F.max("count").alias("mx"))
            .first()["mx"]
        )
        if mx is not None and int(mx) > int(hot_key_threshold):
            par = u.sparkSession.sparkContext.defaultParallelism
            hot_key_buckets = max(8, min(256, int(par)))
        else:
            hot_key_buckets = None

    part_keys: list = list(by)
    if hot_key_buckets is not None and hot_key_buckets > 1:
        u = _bucket_and_seed(
            u, on, by, [c + suffix for c in right_value_cols], int(hot_key_buckets)
        )
        part_keys.append("__b__")

    # Right rows sort before left rows at equal timestamps so an exactly
    # concurrent right row is visible to the left row (<= semantics);
    # strict (<) flips the tie order so it is not.
    side_order = F.col("__side__").desc() if strict else F.col("__side__").asc()
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col(on).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
        for c in right_value_cols
    ]
    carried.append(
        F.last(F.when(F.col("__side__") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("__right_ts__")
    )
    out = u.select(
        *[c for c in left.columns], "__side__", *carried
    ).where(F.col("__side__") == 1)
    if tolerance_us is not None:
        # numeric `on` columns already hold µs — casting a long to
        # timestamp would reinterpret it as SECONDS and inflate the age
        # by 1e6, nulling out nearly every match
        if dict(left.dtypes)[on].startswith("timestamp"):
            age = F.unix_micros(F.col(on)) - F.unix_micros(F.col("__right_ts__"))
        else:
            age = F.col(on) - F.col("__right_ts__")
        keep = F.col("__right_ts__").isNotNull() & (age <= F.lit(int(tolerance_us)))
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(keep, F.col(c + suffix)).alias(c + suffix)
                for c in right_value_cols
            ],
            *(
                [F.when(keep, F.col("__right_ts__")).alias(match_ts_col)]
                if match_ts_col
                else []
            ),
        )
    else:
        out = out.select(
            *[c for c in left.columns],
            *[F.col(c + suffix) for c in right_value_cols],
            *([F.col("__right_ts__").alias(match_ts_col)] if match_ts_col else []),
        )
    return out


def interpolation_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_value_cols: list[str],
    suffix: str = "_interp",
) -> DataFrame:
    """For every left row, LINEARLY INTERPOLATE each right value between
    the bracketing right rows (same ``by`` keys, nearest right.on at or
    before and at or after left.on) — the Timescale/InfluxDB
    ``interpolate`` analog, where ``asof_join`` is their LOCF.

    Exact-timestamp matches return the right value itself; left rows
    outside the right side's time span get NULL (strict interpolation,
    matching gapfill's "linear" contract). Right value columns are
    assumed non-null (their nulls would silently widen the bracket).

    Same scale shape as ``asof_join``: one union, one shuffle on the
    key, two window passes (preceding / following) — no per-group
    pandas, no cross join; skewed keys fall to AQE.
    """
    l = left.withColumn("__side__", F.lit(1))
    r = right.select(
        *by, on, *[F.col(c).alias(c + suffix) for c in right_value_cols]
    ).withColumn("__side__", F.lit(0))
    all_cols = set(l.columns) | set(r.columns)
    l = l.select(*[F.col(c) if c in l.columns else F.lit(None).alias(c) for c in all_cols])
    r = r.select(*[F.col(c) if c in r.columns else F.lit(None).alias(c) for c in all_cols])
    u = l.unionByName(r)

    if dict(left.dtypes)[on].startswith("timestamp"):
        t_num = F.unix_micros(F.col(on))
    else:
        t_num = F.col(on).cast("long")
    u = u.withColumn("__t__", t_num)

    # right rows sort before left at equal times: the preceding window
    # sees a concurrent right row (exact match), the following window
    # starts at the current row so it sees only later right rows
    w_prev = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    right_only = lambda c: F.when(F.col("__side__") == 0, c)  # noqa: E731
    prev_t = F.last(right_only(F.col("__t__")), ignorenulls=True).over(w_prev)
    next_t = F.first(right_only(F.col("__t__")), ignorenulls=True).over(w_next)
    cols = [F.col("__t__").alias("__lt__"), prev_t.alias("__pt__"), next_t.alias("__nt__")]
    for c in right_value_cols:
        cols.append(
            F.last(right_only(F.col(c + suffix)), ignorenulls=True).over(w_prev).alias(f"__pv_{c}__")
        )
        cols.append(
            F.first(right_only(F.col(c + suffix)), ignorenulls=True).over(w_next).alias(f"__nv_{c}__")
        )
    staged = u.select(*[F.col(c) for c in left.columns], "__side__", *cols).where(
        F.col("__side__") == 1
    )
    frac = (F.col("__lt__") - F.col("__pt__")) / (F.col("__nt__") - F.col("__pt__"))
    out_cols = list(left.columns)
    for c in right_value_cols:
        pv, nv = F.col(f"__pv_{c}__"), F.col(f"__nv_{c}__")
        interp = (
            F.when(F.col("__pt__") == F.col("__lt__"), pv)
            .when(F.col("__pt__").isNull() | F.col("__nt__").isNull(), F.lit(None))
            .otherwise(pv + (nv - pv) * frac)
        )
        out_cols.append(interp.alias(c + suffix))
    return staged.select(*out_cols)


# ---------------------------------------------------------------------------
# ASOF JOIN SQL surface (DuckDB / Snowflake shape)
# ---------------------------------------------------------------------------

# SELECT <proj> FROM <lt> [AS] [<la>] ASOF [LEFT] JOIN <rt> [AS] [<ra>]
#   [MATCH_CONDITION ( <ineq> )] ON <conds> [<tail>]
_ASOF_SQL_RE = __import__("re").compile(
    r"^\s*SELECT\s+(?P<proj>.*?)\s+FROM\s+"
    r"(?P<lt>[A-Za-z_][\w.]*)(?:\s+AS)?(?:\s+(?P<la>(?!ASOF\b)[A-Za-z_]\w*))?\s+"
    r"ASOF\s+(?P<ltype>LEFT\s+)?JOIN\s+"
    r"(?P<rt>[A-Za-z_][\w.]*)(?:\s+AS)?(?:\s+(?P<ra>(?!MATCH_CONDITION\b|ON\b)[A-Za-z_]\w*))?\s+"
    r"(?:MATCH_CONDITION\s*\(\s*(?P<match>[^)]+?)\s*\)\s+)?"
    r"ON\s+(?P<conds>.+?)"
    r"(?P<tail>\s+(?:WHERE|GROUP\s+BY|ORDER\s+BY|LIMIT|HAVING)\b.*)?\s*$",
    __import__("re").IGNORECASE | __import__("re").DOTALL,
)

_COND_EQ_RE = __import__("re").compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)
_COND_INEQ_RE = __import__("re").compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(>=|<=|>|<)\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)


def rewrite_asof_sql(spark, sql: str):
    """Execute the standard ``ASOF JOIN`` SQL shape (DuckDB inequality-
    in-ON syntax and Snowflake ``MATCH_CONDITION`` syntax) through
    ``asof_join`` — Spark SQL has no ASOF JOIN of its own. Returns a
    DataFrame, or None when the statement is not an as-of join (callers
    fall through to plain ``spark.sql``).

    Supported grammar (single join; both tables must already resolve
    via ``spark.table`` — engine tables are registered as views first):

        SELECT <exprs> FROM lt [AS] la ASOF [LEFT] JOIN rt [AS] ra
          [MATCH_CONDITION ( la.ts >= ra.ts )]
          ON la.k = ra.k [AND ...] [AND la.ts >= ra.ts]
          [WHERE ...] [GROUP BY ...] [HAVING ...] [ORDER BY ...] [LIMIT n]

    The inequality (in MATCH_CONDITION or as the single non-equality ON
    term) must compare one column from each side; ``>=``/``>`` (or the
    mirrored ``<=``/``<``) mean "most recent right row at-or-before /
    strictly-before the left row" — the only as-of direction implemented.
    Plain ``ASOF JOIN`` is an INNER join (unmatched left rows drop,
    DuckDB semantics); ``ASOF LEFT JOIN`` keeps them with NULLs.
    Qualified references (``la.x``, ``ra.y``) in the projection and tail
    are rewritten onto the joined frame; alias output columns explicitly
    (``AS name``) for stable result names."""
    import re as _re
    import uuid

    m = _ASOF_SQL_RE.match(sql)
    if not m:
        return None
    la = m["la"] or m["lt"]
    ra = m["ra"] or m["rt"]
    conds = _re.split(r"\s+AND\s+", m["conds"].strip(), flags=_re.IGNORECASE)
    eqs: list[tuple[str, str]] = []  # (left col, right col)
    ineq = None
    if m["match"]:
        ineq = _COND_INEQ_RE.match(m["match"])
        if not ineq:
            raise ValueError(
                "ASOF JOIN: MATCH_CONDITION must be a single two-sided "
                "inequality like l.ts >= r.ts"
            )
    for c in conds:
        if eq := _COND_EQ_RE.match(c):
            q1, c1, q2, c2 = eq.groups()
            if q1 == la and q2 == ra:
                eqs.append((c1, c2))
            elif q1 == ra and q2 == la:
                eqs.append((c2, c1))
            else:
                raise ValueError(f"ASOF JOIN: equality must join {la} to {ra}: {c!r}")
        elif (iq := _COND_INEQ_RE.match(c)) and ineq is None:
            ineq = iq
        else:
            raise ValueError(f"ASOF JOIN: unsupported ON term {c!r}")
    if ineq is None:
        raise ValueError(
            "ASOF JOIN needs exactly one inequality (in MATCH_CONDITION or ON)"
        )
    q1, c1, op, q2, c2 = ineq.groups()
    # normalize to left <op> right
    if q1 == ra and q2 == la:
        q1, c1, q2, c2 = q2, c2, q1, c1
        op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
    if (q1, q2) != (la, ra):
        raise ValueError("ASOF JOIN: inequality must compare the two joined tables")
    if op in ("<", "<="):
        raise ValueError(
            "ASOF JOIN: only the most-recent-right-at-or-before direction "
            "(left.ts >= right.ts or left.ts > right.ts) is implemented"
        )
    strict = op == ">"
    if not eqs:
        raise ValueError("ASOF JOIN needs at least one equality ON term")

    left = spark.table(m["lt"])
    right = spark.table(m["rt"])
    # canonical helper columns avoid any name collision between sides;
    # every ORIGINAL right column (keys and timestamp included) is
    # carried as a value so `ra.x` references see NULL on unmatched rows
    by = [f"__by{i}__" for i in range(len(eqs))]
    lcanon = left.select(
        "*",
        *[F.col(lc).alias(b) for (lc, _), b in zip(eqs, by)],
        F.col(c1).alias("__on__"),
    )
    rcanon = right.select(
        *[F.col(rc).alias(b) for (_, rc), b in zip(eqs, by)],
        F.col(c2).alias("__on__"),
        *[F.col(c).alias(f"__rv_{c}__") for c in right.columns],
    )
    joined = asof_join(
        lcanon,
        rcanon,
        on="__on__",
        by=by,
        right_value_cols=[f"__rv_{c}__" for c in right.columns],
        suffix="",
        strict=strict,
        match_ts_col="__match_ts__",
    )
    if not m["ltype"]:  # plain ASOF JOIN = inner
        joined = joined.where(F.col("__match_ts__").isNotNull())
    joined = joined.drop(*by, "__on__", "__match_ts__")

    def requalify(text: str) -> str:
        text = _re.sub(rf"\b{_re.escape(ra)}\.([A-Za-z_]\w*)", r"__rv_\1__", text)
        return _re.sub(rf"\b{_re.escape(la)}\.([A-Za-z_]\w*)", r"\1", text)

    view = f"__asof_{uuid.uuid4().hex[:12]}__"
    joined.createOrReplaceTempView(view)
    try:
        out = spark.sql(
            f"SELECT {requalify(m['proj'])} FROM {view}{requalify(m['tail'] or '')}"
        )
    finally:
        # the plan is resolved at spark.sql() time; the view can go
        spark.catalog.dropTempView(view)
    return out
