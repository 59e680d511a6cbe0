"""The public Column-function surface — the scalar/aggregate building
blocks the operator family is made of, importable directly for use in
arbitrary DataFrame pipelines:

    from modelardb_rs_spark import functions as MF
    df.select(MF.fingerprint(F.col("text")), MF.token_count(F.col("text")))

Everything here is pure Column algebra (JVM-side, codegen-friendly): no
UDFs, no Python in the hot path. The reference exposes no custom scalar
functions (it inherits DataFusion's library, SURVEY §2.7); this module
is the engine-specific additions on top of Spark's built-ins.
"""

from modelardb_rs_spark.operators.aggregates import (  # noqa: F401
    SIMPLE_AGGS,
    pushdown_agg_column,
)
from modelardb_rs_spark.operators.dedup import shingles  # noqa: F401
from modelardb_rs_spark.operators.pii import (  # noqa: F401
    PII_PATTERNS,
    redact_pii,
)
from modelardb_rs_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
)
from modelardb_rs_spark.operators.text import (  # noqa: F401
    BPE_TOKEN_PATTERN,
    LANG_STOPWORDS,
    bpe_token_count,
    fingerprint,
    punct_count,
    stopword_count,
    token_count,
    tokens,
)

__all__ = [
    "SIMPLE_AGGS",
    "pushdown_agg_column",
    "shingles",
    "PII_PATTERNS",
    "redact_pii",
    "cosine",
    "dot",
    "BPE_TOKEN_PATTERN",
    "LANG_STOPWORDS",
    "bpe_token_count",
    "fingerprint",
    "punct_count",
    "stopword_count",
    "token_count",
    "tokens",
]
