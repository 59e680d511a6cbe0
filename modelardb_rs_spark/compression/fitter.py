"""Greedy model fitter — numpy-vectorized per-series segmenter.

Reimplements the semantics of the reference's greedy fitter
(crates/modelardb_compression/src/compression.rs:191-399): scan a sorted
univariate series left→right, cover it with PMC-Mean constant segments
(pmc_mean.rs:31-110), Swing linear segments (swing.rs:35-345), and
Gorilla-style raw-value segments (macaque_v.rs), such that every
reconstructed value is within the declared error bound of the ingested
value (models/mod.rs:53-80).

The exact reference segmentation is NOT reproduced (nor required — only
the bound guarantee and query results are semantics); this fitter is
designed to be vectorized:

- per-point allowed intervals [lo, hi] are computed once (lossless:
  degenerate; absolute: v±e; relative: v±|v|·pct/100),
- candidate anchors (where a PMC pair or Swing triple could start) are
  precomputed vectorized, so runs of incompressible data skip straight
  into Gorilla segments without a per-point Python loop,
- each PMC/Swing segment is found with one ``np.maximum.accumulate`` /
  ``np.minimum.accumulate`` scan over a bounded window,
- every emitted segment's float32 reconstruction is verified against the
  bounds and truncated at the first violation (guards f32 rounding at
  interval edges), so the bound guarantee is exact, not approximate.

Segments are capped at 65,536 points, mirroring the reference's
per-series buffer capacity (crates/modelardb_server/src/storage/mod.rs:58).
"""

from __future__ import annotations

import numpy as np

from modelardb_rs_spark.compression import encoding
from modelardb_rs_spark.types import (
    GORILLA_ID,
    PMC_MEAN_ID,
    SWING_ID,
    ErrorBound,
    ErrorBoundKind,
)

MAX_SEGMENT_LEN = 65536
_MIN_PMC_LEN = 2
_MIN_SWING_LEN = 3
_MIN_LOSSY_MODEL_LEN = 16


def _allowed_intervals(v64: np.ndarray, bound: ErrorBound) -> tuple[np.ndarray, np.ndarray]:
    if bound.kind == ErrorBoundKind.LOSSLESS:
        return v64.copy(), v64.copy()
    if bound.kind == ErrorBoundKind.ABSOLUTE:
        e = np.full_like(v64, bound.value)
    else:  # relative: |recon - v| <= |v| * pct / 100
        e = np.abs(v64) * (bound.value / 100.0)
    return v64 - e, v64 + e


def _spark_min(values: np.ndarray) -> float:
    """min with Spark SQL NaN semantics (NaN sorts greatest)."""
    if np.isnan(values).all():
        return float("nan")
    return float(np.nanmin(values))


def _spark_max(values: np.ndarray) -> float:
    if np.isnan(values).any():
        return float("nan")
    return float(np.max(values))


class _SegmentSink:
    """Accumulates emitted segments as parallel column lists."""

    __slots__ = ("cols",)

    def __init__(self) -> None:
        self.cols: dict[str, list] = {
            "model_type_id": [],
            "start_time": [],
            "end_time": [],
            "timestamps": [],
            "min_value": [],
            "max_value": [],
            "values": [],
            "residuals": [],
            "error": [],
            "value_count": [],
            "seg_sum": [],
            "seg_sum_sq": [],
            "ts_kind": [],
            "param0": [],
            "param1": [],
        }

    def emit(
        self,
        model_type_id: int,
        ts: np.ndarray,
        recon_f32: np.ndarray,
        payload: bytes,
        v64: np.ndarray,
        param0: float | None = None,
        param1: float | None = None,
    ) -> None:
        c = self.cols
        recon64 = recon_f32.astype(np.float64)
        ts_payload, regular = encoding.encode_timestamps(ts)
        c["model_type_id"].append(model_type_id)
        c["start_time"].append(int(ts[0]))
        c["end_time"].append(int(ts[-1]))
        c["timestamps"].append(ts_payload)
        c["ts_kind"].append(0 if regular else 1)
        c["param0"].append(None if param0 is None else float(np.float32(param0)))
        c["param1"].append(param1)
        c["min_value"].append(np.float32(_spark_min(recon64)))
        c["max_value"].append(np.float32(_spark_max(recon64)))
        c["values"].append(payload)
        c["residuals"].append(b"")
        diff = np.abs(recon64 - v64)
        c["error"].append(np.float32(0.0 if len(diff) == 0 else np.nanmax(np.where(np.isnan(diff), 0.0, diff))))
        c["value_count"].append(len(ts))
        c["seg_sum"].append(float(np.sum(recon64)))
        # sum of squares of the reconstructed values: enables exact
        # variance/stddev pushdown (an extension past the reference's
        # count/min/max/sum/avg accumulator set)
        c["seg_sum_sq"].append(float(np.sum(recon64 * recon64)))


def _pmc_run(lo: np.ndarray, hi: np.ndarray, i: int, win_end: int) -> tuple[int, float]:
    """Longest PMC-Mean run starting at i (within window); returns (length, mean).

    Scans with a doubling window so short runs cost O(run), not O(window).
    """
    w = 32
    while True:
        e = min(i + w, win_end)
        lo_acc = np.maximum.accumulate(lo[i:e])
        hi_acc = np.minimum.accumulate(hi[i:e])
        ok = lo_acc <= hi_acc  # NaN-poisoned comparisons are False -> run stops
        if ok.all():
            if e == win_end:
                length = e - i
                break
            w *= 4
        else:
            length = int(np.argmin(ok))
            break
    while length >= 1:
        m = (lo_acc[length - 1] + hi_acc[length - 1]) / 2.0
        m32 = np.float64(np.float32(m))
        # negated-inside form: a NaN reconstruction (e.g. from inf
        # arithmetic) must count as a violation, not slip past < / >
        viol = np.flatnonzero(~((m32 >= lo[i : i + length]) & (m32 <= hi[i : i + length])))
        if len(viol) == 0:
            return length, float(m)
        length = int(viol[0])
    return 0, 0.0


def _swing_run(
    ts: np.ndarray, v64: np.ndarray, lo: np.ndarray, hi: np.ndarray, i: int, win_end: int
) -> tuple[int, float, np.ndarray]:
    """Longest Swing run starting at i: a line anchored at (ts[i], v[i]) whose
    value at every covered timestamp stays within [lo, hi]. Returns
    (length, slope, recon_f32)."""
    t0 = ts[i]
    v0 = v64[i]
    v0_32 = np.float64(np.float32(v0))
    if not (lo[i] <= v0_32 <= hi[i]) or not np.isfinite(v0):
        # non-finite anchors (inf arithmetic yields NaN lines) and
        # out-of-interval anchors can never seed a valid line
        return 0, 0.0, np.empty(0, np.float32)
    if i + 1 >= win_end or ts[i + 1] <= t0:
        return 1, 0.0, np.empty(0, np.float32)
    w = 32
    while True:
        e = min(i + 1 + w, win_end)
        dt = (ts[i + 1 : e] - t0).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            slo = np.maximum.accumulate((lo[i + 1 : e] - v0) / dt)
            shi = np.minimum.accumulate((hi[i + 1 : e] - v0) / dt)
        ok = slo <= shi
        if ok.all():
            if e == win_end:
                npts = len(dt)
                break
            w *= 4
        else:
            npts = int(np.argmin(ok))
            break
    while npts >= 1:
        slope = (slo[npts - 1] + shi[npts - 1]) / 2.0
        with np.errstate(invalid="ignore"):
            recon = (v0 + slope * dt[:npts]).astype(np.float32)
        r64 = recon.astype(np.float64)
        viol = np.flatnonzero(
            ~((r64 >= lo[i + 1 : i + 1 + npts]) & (r64 <= hi[i + 1 : i + 1 + npts]))
        )
        if len(viol) == 0:
            full = np.empty(npts + 1, np.float32)
            full[0] = np.float32(v0)
            full[1:] = recon
            return npts + 1, float(slope), full
        npts = int(viol[0])
    return 1, 0.0, np.empty(0, np.float32)


def fit_series(
    ts_us: np.ndarray,
    values_f32: np.ndarray,
    bound: ErrorBound,
    max_segment_len: int = MAX_SEGMENT_LEN,
) -> dict[str, list]:
    """Fit one sorted univariate series; returns segment columns
    (model_type_id, start_time, end_time, timestamps, min_value, max_value,
    values, residuals, error, value_count, seg_sum) as parallel lists."""
    ts = np.asarray(ts_us, dtype=np.int64)
    v32 = np.asarray(values_f32, dtype=np.float32)
    n = len(ts)
    sink = _SegmentSink()
    if n == 0:
        return sink.cols
    v64 = v32.astype(np.float64)
    lo, hi = _allowed_intervals(v64, bound)

    # Candidate anchors: a PMC pair or a Swing triple could start here.
    pair_ok = np.zeros(n, dtype=bool)
    if n >= 2:
        with np.errstate(invalid="ignore"):
            pair_ok[:-1] = np.maximum(lo[:-1], lo[1:]) <= np.minimum(hi[:-1], hi[1:])
    swing_ok = np.zeros(n, dtype=bool)
    if n >= 3:
        dt1 = (ts[1:-1] - ts[:-2]).astype(np.float64)
        dt2 = (ts[2:] - ts[:-2]).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            s1lo = (lo[1:-1] - v64[:-2]) / dt1
            s1hi = (hi[1:-1] - v64[:-2]) / dt1
            s2lo = (lo[2:] - v64[:-2]) / dt2
            s2hi = (hi[2:] - v64[:-2]) / dt2
            swing_ok[:-2] = (np.maximum(s1lo, s2lo) <= np.minimum(s1hi, s2hi)) & (dt1 > 0)
    cand = pair_ok | swing_ok
    cand_idx = np.flatnonzero(cand)

    # Minimum worthwhile model run: for lossy bounds short runs are a net
    # loss vs. a Gorilla run (segment-row overhead > 4 B/value) and fragment
    # the series; for lossless, 2-point PMC / 3-point Swing already pay off.
    if bound.kind == ErrorBoundKind.LOSSLESS:
        min_pmc, min_swing = _MIN_PMC_LEN, _MIN_SWING_LEN
    else:
        min_pmc = min_swing = _MIN_LOSSY_MODEL_LEN

    def quantize_gorilla(chunk32: np.ndarray, s: int, e: int) -> np.ndarray:
        """Lossy Gorilla quantization (reference macaque_v.rs lossy mode
        zeroes mantissa bits / reuses values within the bound): snap
        values to a coarse grid so nearby values share a bit pattern and
        XOR residues collapse — a linear 2e grid under an absolute bound,
        a sign-preserving log grid under a relative bound. Any point the
        f32 cast would push outside its interval keeps its exact value.
        """
        if bound.kind == ErrorBoundKind.ABSOLUTE:
            step = 2.0 * bound.value
            q = np.rint(chunk32.astype(np.float64) / step) * step
        elif bound.kind == ErrorBoundKind.RELATIVE:
            r = bound.value / 100.0
            # grid pitch in log space: nearest grid point is within a
            # (1±r) factor when consecutive points are (1+r)/(1-r) apart
            h = np.log((1.0 + r) / (1.0 - r)) if r < 1.0 else 1.0
            c64 = chunk32.astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.sign(c64) * np.exp(np.rint(np.log(np.abs(c64)) / h) * h)
            q[c64 == 0.0] = 0.0
        else:
            return chunk32
        q32 = q.astype(np.float32)
        q64 = q32.astype(np.float64)
        bad = ~((q64 >= lo[s:e]) & (q64 <= hi[s:e]))  # NaN/inf compare False
        q32 = q32.copy()
        q32[bad] = chunk32[bad]
        return q32

    def flush_gorilla(s: int, e: int) -> None:
        for cs in range(s, e, max_segment_len):
            ce = min(cs + max_segment_len, e)
            recon = quantize_gorilla(v32[cs:ce], cs, ce)
            sink.emit(
                GORILLA_ID,
                ts[cs:ce],
                recon,
                encoding.encode_gorilla(recon),
                v64[cs:ce],
            )

    gorilla_start = -1
    i = 0
    while i < n:
        if not cand[i]:
            # Skip vectorized to the next possible model anchor.
            nxt = cand_idx[np.searchsorted(cand_idx, i)] if np.searchsorted(cand_idx, i) < len(cand_idx) else n
            if gorilla_start < 0:
                gorilla_start = i
            i = int(nxt)
            continue
        win_end = min(i + max_segment_len, n)
        lp, mean = _pmc_run(lo, hi, i, win_end)
        ls, slope, swing_recon = _swing_run(ts, v64, lo, hi, i, win_end)
        use_swing = ls >= min_swing and ls > lp
        use_pmc = (not use_swing) and lp >= min_pmc
        if not (use_swing or use_pmc):
            if gorilla_start < 0:
                gorilla_start = i
            # Too short to be worth a model row: skip the whole failed run.
            # A ≥min-length run can in principle start inside it, but data
            # dense with sub-minimum runs would otherwise cost one scan per
            # point or two (this trades marginal compression for O(n/run)
            # fitter iterations — the bound guarantee is unaffected since
            # skipped points go to the Gorilla path).
            i += max(1, lp, ls)
            continue
        if gorilla_start >= 0:
            flush_gorilla(gorilla_start, i)
            gorilla_start = -1
        if use_swing:
            sink.emit(
                SWING_ID,
                ts[i : i + ls],
                swing_recon,
                encoding.encode_swing(v64[i], slope),
                v64[i : i + ls],
                param0=v64[i],
                param1=float(slope),
            )
            i += ls
        else:
            recon = np.full(lp, np.float32(mean), dtype=np.float32)
            sink.emit(
                PMC_MEAN_ID,
                ts[i : i + lp],
                recon,
                encoding.encode_pmc(mean),
                v64[i : i + lp],
                param0=mean,
                param1=0.0,
            )
            i += lp
    if gorilla_start >= 0:
        flush_gorilla(gorilla_start, n)
    return sink.cols
