"""Embedding scalar quantization: symmetric per-dimension int8 codes —
the storage/bandwidth lever for embedding corpora (4× smaller than
float32, 8× smaller than the float64 arrays Spark shuffles), used by
every large-scale vector system as the cheap tier under PQ.

Fits corpus statistics (per-dimension max |x|) in one narrow aggregate,
then quantizes map-only with the scales broadcast as a literal-free
tiny crossJoin — no Python, no RNG, exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def int8_scales(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension symmetric scale ``s_d = max(|x_d|) / 127`` over
    the corpus: (dim int, scale double). One posexplode feeding a
    map-side-combining max — O(rows × dim) scanned, |dim| rows out."""
    ex = corpus.select(F.posexplode(F.col(vec_col)).alias("dim", "__x__"))
    return ex.groupBy("dim").agg(
        (F.max(F.abs(F.col("__x__"))) / F.lit(127.0)).alias("scale")
    )


def _scales_array(scales: DataFrame):
    """The (dim, scale) frame as a single-row array<double> ordered by
    dim — tiny (|dim| rows), crossJoin-broadcast into the map-only
    quantization pass."""
    return scales.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "scale"))),
            lambda s: s["scale"],
        ).alias("__scales__")
    )


def _guard_scales_len(vec_col: str, result):
    """Fail loudly when the broadcast scales array's length mismatches a
    vector: ``zip_with`` would silently null-pad and the ``otherwise(0)``
    zero-dimension branch would then emit all-zero codes for the excess
    dims — a wrong-scales bug (e.g. scales fit on a different-dimension
    corpus) must surface as an error, not as corrupt codes."""
    return F.when(
        F.size(F.col(vec_col)) != F.size(F.col("__scales__")),
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("int8 quantization: scales length"),
                F.size(F.col("__scales__")).cast("string"),
                F.lit("!= vector length"),
                F.size(F.col(vec_col)).cast("string"),
            )
        ),
    ).otherwise(result)


def quantize_int8(
    corpus: DataFrame,
    scales: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to int8 codes: ``q_d = round(x_d / s_d)``
    clamped to [-127, 127] (a dimension that is identically zero keeps
    code 0). Returns (id_col, int8_codes array<int>, plus every other
    input column). Map-only after the one tiny scales broadcast;
    ``scales`` defaults to ``int8_scales(corpus)`` but should be the
    TRAINING corpus' scales when quantizing a query/append batch, so
    codes stay comparable. A scales/vector length mismatch raises
    (``_guard_scales_len``) instead of silently zero-padding codes."""
    sc = _scales_array(int8_scales(corpus, vec_col) if scales is None else scales)
    q = F.zip_with(
        F.col(vec_col),
        F.col("__scales__"),
        lambda x, s: F.when(s > 0,
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(x / s, 0).cast("int")),
            )
        ).otherwise(F.lit(0)),
    )
    others = [c for c in corpus.columns if c not in (id_col, vec_col)]
    return (
        corpus.crossJoin(F.broadcast(sc))
        .select(
            F.col(id_col),
            _guard_scales_len(vec_col, q).alias("int8_codes"),
            vec_col,
            *others,
        )
        .drop("__scales__")
    )


def int8_reconstruction_stats(
    corpus: DataFrame,
    scales: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Per-vector quantization fidelity: (id_col, max_abs_err,
    cos_to_original) against the dequantized vector ``q_d * s_d``.
    The quality gate for choosing int8 vs PQ vs raw on a corpus —
    cosine ≥ 0.999 is the usual "int8 is free" verdict. Same map-only
    shape as ``quantize_int8``; errors reduce over each row's array
    in index order (deterministic, oracle-exact after rounding)."""
    sc = _scales_array(int8_scales(corpus, vec_col) if scales is None else scales)
    dq = F.zip_with(
        F.col(vec_col),
        F.col("__scales__"),
        lambda x, s: F.when(
            s > 0,
            F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.round(x / s, 0)),
            )
            * s,
        ).otherwise(F.lit(0.0)),
    )
    with_dq = corpus.crossJoin(F.broadcast(sc)).withColumn(
        "__dq__", _guard_scales_len(vec_col, dq)
    )
    err = F.array_max(
        F.zip_with(F.col(vec_col), F.col("__dq__"), lambda x, y: F.abs(x - y))
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = dot(F.col(vec_col), F.col("__dq__")) / (
        F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
        * F.sqrt(dot(F.col("__dq__"), F.col("__dq__")))
    )
    return with_dq.select(
        F.col(id_col),
        F.round(err, decimals).alias("max_abs_err"),
        F.round(cos, decimals).alias("cos_to_original"),
    )
