"""Model-based compression core (numpy-vectorized).

Reimplements the query-visible semantics of the reference's
``modelardb_compression`` crate — PMC-Mean constant models, Swing linear
models, Gorilla-style value runs, and regular/irregular timestamp
encodings — with simplified byte layouts (see encoding.py) and a
vectorized greedy fitter (see fitter.py). The error-bound guarantee
(reference crates/modelardb_compression/src/models/mod.rs:53-80) is
preserved: every reconstructed value is within the declared
lossless/absolute/relative bound of the ingested value.
"""

from modelardb_rs_spark.compression.fitter import fit_series
from modelardb_rs_spark.compression.decode import decode_segments

__all__ = ["fit_series", "decode_segments"]
