"""Segment → data-point decoding ("gridding"), batch-vectorized.

Semantics of the reference's GridExec reconstruction loop
(crates/modelardb_storage/src/query/grid_exec.rs:261-391) and model
``grid()`` (crates/modelardb_compression/src/models/mod.rs:190-251):
decode the timestamps of each segment, evaluate the model at every
timestamp, and replicate the tag values.

Vectorization strategy: a batch of segment rows is split by shape
(single-point / two-point / regular / irregular timestamps, and by model
type); each group is reconstructed with whole-array numpy ops
(``np.repeat`` of per-segment coefficients + one global ``arange``), so
decode cost is O(points) with no per-point Python. Output row order
within the batch is NOT the segment order — Spark DataFrames are
unordered, callers re-sort if they need an order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from modelardb_rs_spark.compression import encoding
from modelardb_rs_spark.types import GORILLA_ID, PMC_MEAN_ID, SWING_ID


def _counts_and_intervals(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment point counts and (for regular segments) µs intervals."""
    payloads = pdf["timestamps"].to_numpy()
    starts = pdf["start_time"].to_numpy()
    ends = pdf["end_time"].to_numpy()
    counts = np.array(
        [encoding.timestamps_count(p, s, e) for p, s, e in zip(payloads, starts, ends)],
        dtype=np.int64,
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        intervals = np.where(counts > 1, (ends - starts) // np.maximum(counts - 1, 1), 0)
    return counts, intervals


def decode_segments(pdf: pd.DataFrame, tag_columns: list[str]) -> pd.DataFrame:
    """Decode a pandas batch of segment rows into data points.

    Input columns: the physical segment schema (types.segment_schema).
    Output columns: timestamp (int64 µs), value (float32), *tag_columns.
    """
    if len(pdf) == 0:
        return pd.DataFrame(
            {
                "timestamp": np.empty(0, np.int64),
                "value": np.empty(0, np.float32),
                **{t: np.empty(0, object) for t in tag_columns},
            }
        )

    starts = pdf["start_time"].to_numpy(np.int64)
    payloads = pdf["timestamps"].to_numpy()
    model_ids = pdf["model_type_id"].to_numpy()
    counts, intervals = _counts_and_intervals(pdf)
    irregular = np.array(
        [len(p) > 0 and p[:1] in (b"I", b"V") for p in payloads], dtype=bool
    )

    n_rows = len(pdf)
    total = int(counts.sum())
    out_ts = np.empty(total, np.int64)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])

    # Timestamps: regular segments in one vectorized pass, irregular per-row.
    reg = ~irregular
    if reg.any():
        # position-within-segment for every output point of regular segments
        reg_counts = counts.copy()
        reg_counts[irregular] = 0
        seg_of_point = np.repeat(np.arange(n_rows), reg_counts)
        pos = np.arange(len(seg_of_point)) - np.repeat(
            np.concatenate(([0], np.cumsum(reg_counts)))[:-1], reg_counts
        )
        ts_reg = starts[seg_of_point] + pos * intervals[seg_of_point]
        # scatter into out_ts at each segment's offset
        dest = offsets[seg_of_point] + pos
        out_ts[dest] = ts_reg
    for r in np.flatnonzero(irregular):
        out_ts[offsets[r] : offsets[r + 1]] = encoding.decode_timestamps(
            payloads[r], int(starts[r]), int(pdf["end_time"].iat[r])
        )

    # Values per model type.
    out_val = np.empty(total, np.float32)
    values_payloads = pdf["values"].to_numpy()

    pmc_rows = np.flatnonzero(model_ids == PMC_MEAN_ID)
    if len(pmc_rows):
        means = np.array([encoding.decode_pmc(values_payloads[r]) for r in pmc_rows], np.float32)
        for k, r in enumerate(pmc_rows):
            out_val[offsets[r] : offsets[r + 1]] = means[k]

    swing_rows = np.flatnonzero(model_ids == SWING_ID)
    for r in swing_rows:
        v0, slope = encoding.decode_swing(values_payloads[r])
        seg_ts = out_ts[offsets[r] : offsets[r + 1]]
        out_val[offsets[r] : offsets[r + 1]] = (
            v0 + slope * (seg_ts - starts[r]).astype(np.float64)
        ).astype(np.float32)

    gor_rows = np.flatnonzero(model_ids == GORILLA_ID)
    for r in gor_rows:
        out_val[offsets[r] : offsets[r + 1]] = encoding.decode_gorilla(values_payloads[r])

    out = {"timestamp": out_ts, "value": out_val}
    for t in tag_columns:
        out[t] = np.repeat(pdf[t].to_numpy(), counts)
    return pd.DataFrame(out)
