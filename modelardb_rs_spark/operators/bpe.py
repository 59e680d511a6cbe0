"""Byte-level BPE tokenizer — trained, exact, reversible, distributed.

``text.bpe_token_count`` counts GPT-2-pre-tokenizer PIECES: a useful
vocabulary-free cost proxy, but not what a training pipeline packs on —
a "256-token" sequence must hold 256 REAL tokenizer tokens or every
downstream batch is mis-sized. This module implements the public
byte-level BPE algorithm (merge learning per Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; byte
alphabet + pre-tokenizer shape per Radford et al. 2019, GPT-2) from
scratch:

- a DETERMINISTIC trainer (``train_bpe``): most-frequent pair first,
  ties broken by lexicographically smallest pair, so the same corpus
  always yields the same vocab with no RNG at all;
- a checked-in vocab trained on the test corpus
  (``modelardb_rs_spark/resources/bpe_vocab.py`` — a generated .py
  module because the executor zip ships only .py files; regenerate
  with ``scripts/train_bpe_vocab.py``);
- a fast encoder (``BPETokenizer``): rank-greedy merge loop with a
  piece cache — pieces repeat heavily in natural text, so the merge
  loop runs once per DISTINCT piece per worker;
- a slow REFERENCE encoder (``reference_encode``): applies the merge
  list sequentially in training order, the trainer's own definition
  with no rank shortcuts. The two are algorithmically independent
  routes to the same answer; the oracle literals are pinned from the
  reference path so every driver run cross-checks the fast path;
- Arrow-batched Spark ops (iterator pandas UDFs — the tokenizer loads
  once per worker, then streams batches).

Losslessness is by construction: all 256 bytes are base tokens (ids
0..255 in byte order), so ``decode(encode(x)) == x`` for ANY unicode
string — no unknown-token escape hatch needed. The reference system
has no text stack; this is forward-looking LLM-pipeline surface
(SURVEY.md training-data ops).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-2-shaped pre-tokenizer: contraction suffixes, space-prefixed
# letter/digit/punct runs, whitespace runs (the trailing lookahead keeps
# the last space of an inter-word gap attached to the following piece).
# Written against Python `re` unicode classes: letters = [^\W\d_],
# punctuation = [^\s\w] plus the underscore \w wrongly keeps.
# Every character falls in some branch, so the matches CONCATENATE BACK
# to the input exactly — asserted in tests and by reference_encode.
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[^\W\d_]+"
    r"| ?\d+"
    r"| ?(?:[^\s\w]|_)+"
    r"|\s+(?!\S)"
    r"|\s+"
)
PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)

_PIECE_CACHE_MAX = 65536


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode-char map: the 188
    visibly printable latin-1 bytes map to themselves; the rest (control
    bytes, space, DEL, ...) map to 256+i so every byte has a distinct,
    printable, whitespace-free symbol. Merge files and vocab stay plain
    text; decoding inverts the map before UTF-8 decoding."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: dict[int, str] = {b: chr(b) for b in printable}
    shifted = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shifted)
            shifted += 1
    return mapping


def _merge_word(word: tuple[str, ...], pair: tuple[str, str], merged: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        if i < n - 1 and word[i] == pair[0] and word[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    texts: Iterable[str],
    n_merges: int = 2000,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a merge list from a corpus — the classic BPE trainer over
    pre-tokenized piece frequencies. Deterministic: no sampling, no
    hashing order — the next merge is the most frequent adjacent pair,
    ties broken by the lexicographically smallest (left, right) pair.
    Stops early when no pair reaches ``min_count`` (merging singleton
    pairs just memorizes the corpus). Pure driver-side Python over an
    in-memory iterable; for a corpus-scale fit use
    ``train_bpe_on_corpus`` (the frequency pass runs distributed and
    only the bounded distinct-piece table reaches the driver)."""
    from collections import Counter

    b2u = bytes_to_unicode()
    words: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        if not t:
            continue
        for piece in PRETOKEN_RE.findall(t):
            words[tuple(b2u[b] for b in piece.encode("utf-8"))] += 1
    return train_bpe_from_counts(
        {"".join(w): c for w, c in words.items()},
        n_merges=n_merges,
        min_count=min_count,
        _pre_mapped=True,
    )


def train_bpe_on_corpus(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 2000,
    min_count: int = 2,
    max_pieces: int = 1 << 20,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Distributed BPE training — the 100 TB shape of ``train_bpe``.
    The merge LOOP is inherently sequential and tiny (it iterates over
    the distinct-piece frequency table, which is vocabulary-sized and
    zipfian, not corpus-sized); the expensive part is counting piece
    frequencies over the corpus, and THAT runs as one Arrow-batched
    map + one combiner-friendly groupBy. Only the top ``max_pieces``
    pieces by frequency reach the driver (deterministic order: count
    desc, piece asc) — the truncated tail is rare pieces whose pairs
    fall below ``min_count`` anyway. Identical output to ``train_bpe``
    on the same corpus when nothing is truncated (asserted in tests).

    ``sample_fraction`` trains on a seeded hash-deterministic sample of
    the corpus ROWS ahead of the frequency pass — SCALE.md's prescribed
    mitigation for the merge loop's ~n^1.25 driver wall at multi-
    million-piece tables: sampling thins the zipfian TAIL (rare pieces
    drop below ``min_count`` and never reach the loop) while the head
    frequencies that decide merge order just scale by the fraction, so
    modest fractions reproduce the full fit's early merges (measured in
    SCALE.md "Round-10"; ``1.0`` is byte-identical by construction).
    Deterministic in (text value, ``seed``) — stable across runs,
    partitionings, and engines.

    Supported envelope (measured, SCALE.md "Round-11"): the merge loop
    is nearly FLAT in merge count — 32k/64k/128k merges over a 766k-
    piece sampled table take 652/826/840 s (the wall is the initial
    pair-table build plus the zipfian head, not the merges) — so every
    production vocabulary size trains as a one-shot driver step;
    distributing per-merge pair updates would cost one Spark job per
    merge and was rejected on measurement. Scale ``max_pieces`` and
    ``sample_fraction`` to bound the driver table, not the merge
    count."""
    from pyspark.sql.functions import pandas_udf

    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        bucket = F.abs(F.xxhash64(F.col(text_col), F.lit(int(seed)))) % 1_000_000
        df = df.where(bucket < int(sample_fraction * 1_000_000))

    @pandas_udf("array<string>")
    def pieces_of(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: PRETOKEN_RE.findall(t) if t else [])

    counts = (
        df.select(F.explode(pieces_of(F.col(text_col))).alias("__piece__"))
        .groupBy("__piece__")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .orderBy(F.col("__n__").desc(), F.col("__piece__").asc())
        .limit(int(max_pieces))
        .collect()
    )
    return train_bpe_from_counts(
        {r["__piece__"]: int(r["__n__"]) for r in counts},
        n_merges=n_merges,
        min_count=min_count,
    )


def train_bpe_from_counts(
    piece_counts: dict[str, int],
    n_merges: int = 2000,
    min_count: int = 2,
    _pre_mapped: bool = False,
) -> list[tuple[str, str]]:
    """The shared merge loop: pieces (raw text, or byte-symbol strings
    when ``_pre_mapped``) with frequencies -> ordered merge list.

    Cost shape at real vocab sizes: pair counts update INCREMENTALLY —
    each merge reprocesses only the words that contain the merged pair
    (the ``occurs`` index) — and the per-merge argmax is a LAZY
    MAX-HEAP keyed ``(-count, pair)``, so selecting the next merge is
    O(log H) amortized instead of a full scan of the distinct-pair
    table. The heap key reproduces the scan's exact order (highest
    count, then lexicographically smallest pair), so the merge list is
    byte-identical to the O(pairs)-per-merge loop it replaced; stale
    entries (counts changed after push) are popped and discarded by
    comparing against the live count. Measured: 32k merges over a
    multi-million-piece corpus in SCALE.md "Round-9" — the full-scan
    loop was O(merges x pairs) and impractical past ~2k merges."""
    import heapq
    from collections import Counter, defaultdict

    b2u = bytes_to_unicode()
    if _pre_mapped:
        word_freq = {tuple(p): c for p, c in piece_counts.items()}
    else:
        word_freq = {}
        for p, c in piece_counts.items():
            w = tuple(b2u[b] for b in p.encode("utf-8"))
            word_freq[w] = word_freq.get(w, 0) + c
    pair_counts: Counter[tuple[str, str]] = Counter()
    occurs: dict[tuple[str, str], set[tuple[str, ...]]] = defaultdict(set)
    for w, c in word_freq.items():
        for i in range(len(w) - 1):
            pair_counts[(w[i], w[i + 1])] += c
            occurs[(w[i], w[i + 1])].add(w)

    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    def bump(p: tuple[str, str], c: int, delta: int) -> None:
        pair_counts[p] += delta * c
        if pair_counts[p] <= 0:
            del pair_counts[p]
        else:
            heapq.heappush(heap, (-pair_counts[p], p))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # discard stale heap entries until the top reflects a live count
        while heap and pair_counts.get(heap[0][1], 0) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        top, best = -heap[0][0], heap[0][1]
        if top < min_count:
            break
        heapq.heappop(heap)
        merges.append(best)
        merged_sym = best[0] + best[1]
        for w in list(occurs[best]):
            c = word_freq.pop(w, None)
            if c is None:
                continue
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                bump(p, c, -1)
                occurs[p].discard(w)
            nw = _merge_word(w, best, merged_sym)
            word_freq[nw] = word_freq.get(nw, 0) + c
            for i in range(len(nw) - 1):
                p = (nw[i], nw[i + 1])
                bump(p, c, +1)
                occurs[p].add(nw)
    return merges


def reference_encode(text: str, merges: list[tuple[str, str]]) -> list[int]:
    """Slow, obviously-correct encoder: apply each learned merge IN
    TRAINING ORDER across all pieces — the trainer's own recurrence,
    no rank-greedy shortcut. Used to PIN oracle literals and to
    cross-check ``BPETokenizer`` in tests; never in the hot path."""
    b2u = bytes_to_unicode()
    pieces_text = PRETOKEN_RE.findall(text or "")
    assert "".join(pieces_text) == (text or ""), "pre-tokenizer lost characters"
    pieces = [tuple(b2u[b] for b in p.encode("utf-8")) for p in pieces_text]
    for pair in merges:
        merged = pair[0] + pair[1]
        pieces = [
            _merge_word(w, pair, merged) if pair[0] in w and pair[1] in w else w
            for w in pieces
        ]
    id_of = _token_ids(merges)
    return [id_of[s] for w in pieces for s in w]


def _token_ids(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Token string -> id. Base alphabet = the 256 byte symbols in BYTE
    order (ids 0..255); merge i produces id 256+i. Deterministic given
    the merge list alone — no separate vocab file to drift."""
    b2u = bytes_to_unicode()
    id_of = {b2u[b]: b for b in range(256)}
    for i, (a, b) in enumerate(merges):
        id_of[a + b] = 256 + i
    return id_of


class BPETokenizer:
    """Fast encoder/decoder over a learned merge list (rank-greedy merge
    loop, per-piece memoization). Equivalent to ``reference_encode`` —
    applying the lowest-rank applicable pair repeatedly yields the same
    fixed point as applying merges sequentially in training order."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self.ranks: dict[tuple[str, str], int] = {
            pair: i for i, pair in enumerate(self.merges)
        }
        self.b2u = bytes_to_unicode()
        self.u2b = {u: b for b, u in self.b2u.items()}
        self.id_of = _token_ids(self.merges)
        self.tok_of = {i: t for t, i in self.id_of.items()}
        self._piece_cache: dict[str, list[int]] = {}

    @classmethod
    def default(cls) -> "BPETokenizer":
        """The checked-in vocab (resources/bpe_vocab.py, trained on the
        sf0.01 documents corpus by scripts/train_bpe_vocab.py)."""
        from modelardb_rs_spark.resources.bpe_vocab import MERGES

        return cls(MERGES)

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def _encode_piece(self, piece: str) -> list[int]:
        cached = self._piece_cache.get(piece)
        if cached is not None:
            return cached
        symbols = [self.b2u[b] for b in piece.encode("utf-8")]
        while len(symbols) > 1:
            best_rank = None
            for i in range(len(symbols) - 1):
                r = self.ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = self.merges[best_rank]
            symbols = list(_merge_word(tuple(symbols), (a, b), a + b))
        ids = [self.id_of[s] for s in symbols]
        if len(self._piece_cache) >= _PIECE_CACHE_MAX:
            self._piece_cache.clear()
        self._piece_cache[piece] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        out: list[int] = []
        for piece in PRETOKEN_RE.findall(text):
            out.extend(self._encode_piece(piece))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        symbols = "".join(self.tok_of[int(i)] for i in ids)
        return bytes(self.u2b[ch] for ch in symbols).decode("utf-8")


# ---------------------------------------------------------------------------
# Spark surface — iterator pandas UDFs: the tokenizer (vocab + caches)
# loads ONCE per Python worker, then Arrow batches stream through it.
# ---------------------------------------------------------------------------


def bpe_encode_udf(deterministic: bool = False):
    """pandas UDF: text -> array<int> of real BPE token ids.

    Default is MARKED non-deterministic as an optimizer fence (the
    tokenizer is pure): the training chains gate on a column computed
    by these UDFs (``where(size(bpe_ids) >= n)`` / ``where(n_tok >=
    n)``), and Catalyst's filter pushdown otherwise evaluates the UDF
    once below the pushed filter and AGAIN in the surviving
    projection — real BPE over every document TWICE (the double
    ArrowEvalPython in plans/r13/doc_train_pipeline_bpe_before.txt).
    Guide §4.4: fence the expensive UDFs. ``deterministic=True``
    restores the unfenced form for contexts that REQUIRE it — the
    analyzer rejects non-deterministic expressions inside aggregate
    arguments, so the SQL registration (where users write arbitrary
    ``sum(bpe_count(text))``) uses it.

    BREAKING-DEFAULT NOTE (round 13): the non-deterministic default is
    a public-surface behavior change — a DataFrame-API caller nesting
    the returned UDF directly inside an aggregate argument (e.g.
    ``F.sum(bpe_count_udf()(col))``) or another nondeterminism-
    restricted context now raises AnalysisException; pass
    ``deterministic=True`` there (results are identical — the
    tokenizer is pure)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        tok = BPETokenizer.default()
        for s in batches:
            yield s.map(lambda t: tok.encode(t) if t is not None else None)

    return enc if deterministic else enc.asNondeterministic()


def bpe_count_udf(deterministic: bool = False):
    """pandas UDF: text -> exact BPE token count (long). Cheaper than
    encode-then-size when only the count is packed on. Default carries
    the same optimizer fence as ``bpe_encode_udf`` (the gate filters on
    this column; without the fence the count tokenizes twice)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def cnt(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        tok = BPETokenizer.default()
        for s in batches:
            yield s.map(lambda t: len(tok.encode(t)) if t is not None else None)

    return cnt if deterministic else cnt.asNondeterministic()


def bpe_decode_udf(deterministic: bool = False):
    """pandas UDF: array<int> -> text (exact inverse of encode).
    Default fenced for consistency with encode/count (decode feeds
    equality projections like ``doc_bpe_encode``'s roundtrip flag,
    where a copied evaluation would decode twice)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def dec(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        tok = BPETokenizer.default()
        for s in batches:
            yield s.map(lambda ids: tok.decode(ids) if ids is not None else None)

    return dec if deterministic else dec.asNondeterministic()


def encode_documents(
    df: DataFrame, text_col: str = "text", out_col: str = "bpe_ids"
) -> DataFrame:
    """Attach real BPE token ids (map-only; Arrow-batched)."""
    return df.withColumn(out_col, bpe_encode_udf()(F.col(text_col)))


def exact_token_counts(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """Attach exact BPE token counts — the column to hand
    ``packing.pack_documents(token_count_col=...)`` so packed sequences
    hold N REAL tokens, not N whitespace words."""
    return df.withColumn(out_col, bpe_count_udf()(F.col(text_col)))


def token_ids_hash(ids_col: Column) -> Column:
    """md5 over the comma-joined token ids (JVM-side) — the pinned
    per-document fingerprint the oracle literals compare against."""
    return F.md5(
        F.concat_ws(",", F.transform(ids_col, lambda x: x.cast("string"))).cast(
            "binary"
        )
    )


def register_sql_functions(spark) -> None:
    """Expose the tokenizer to SQL: ``bpe_count(text)``,
    ``bpe_encode(text)`` and ``bpe_decode(ids)`` become session UDFs, so
    ``engine.read_sql("SELECT bpe_count(text) FROM docs")`` works the
    way the Column API does. Idempotent per session (re-registration
    replaces the same functions); the UDFs are the same Arrow-batched
    iterator pandas UDFs as the DataFrame surface — one tokenizer load
    per worker, never per row."""
    if getattr(spark, "_bpe_sql_registered", False):
        return
    # DETERMINISTIC registrations: SQL users aggregate over these
    # (``sum(bpe_count(text))``), and the analyzer rejects
    # non-deterministic expressions inside aggregate arguments — the
    # DataFrame-surface factories keep the §4.4 optimizer fence instead.
    spark.udf.register("bpe_count", bpe_count_udf(deterministic=True))
    spark.udf.register("bpe_encode", bpe_encode_udf(deterministic=True))
    spark.udf.register("bpe_decode", bpe_decode_udf(deterministic=True))
    spark._bpe_sql_registered = True
