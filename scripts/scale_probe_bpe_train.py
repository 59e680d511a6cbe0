"""BPE trainer probe (round-9): is vocab training a practical one-shot
at REAL vocab scale — 32k merges over a multi-million-distinct-piece
frequency table — or does the driver-side merge loop need more work?

The trainer's input is the distinct-piece frequency table (the
distributed pass in train_bpe_on_corpus reduces the corpus to it), so
the LOOP is probed directly on a synthetic zipfian table: ``n_pieces``
distinct pseudo-words (seeded RNG, letters, len 3-12) with counts
~ 1/rank — the shape a web corpus's piece table actually has. This
isolates the merge loop from parquet I/O; the frequency pass itself is
a plain explode+groupBy measured elsewhere (SCALE.md "Round-8" BPE
rows).

Round-9 change under test: the per-merge argmax is a lazy max-heap
keyed (-count, pair) instead of a full scan of the distinct-pair table
(O(merges x pairs)); byte-identical merge output (the checked-in vocab
regenerates unchanged), so the probe measures pure loop throughput.

Usage: python scripts/scale_probe_bpe_train.py [n_pieces] [n_merges] [sample_fraction]
         (default 3_000_000 32_768 1.0)

``sample_fraction < 1`` measures the SCALE.md "sampled piece table"
recipe (train_bpe_on_corpus(sample_fraction=...)): sampling corpus
rows at fraction f thins each piece's count ~ Binomial(count, f) and
drops tail pieces whose thinned count hits 0 / falls below min_count —
emulated here directly on the synthetic table (seeded) so the probe
isolates the merge loop's wall at the SAMPLED table size.
"""

from __future__ import annotations

import json
import random
import string
import sys
import time

sys.path.insert(0, "/root/repo")

from modelardb_rs_spark.operators.bpe import train_bpe_from_counts


def synth_piece_counts(n_pieces: int, seed: int = 11) -> dict[str, int]:
    rng = random.Random(seed)
    counts: dict[str, int] = {}
    while len(counts) < n_pieces:
        w = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 12))
        )
        if w not in counts:
            # zipf-ish: count ~ N / rank, floor 1
            counts[w] = max(1, n_pieces // (len(counts) + 1))
    return counts


def thin_counts(counts: dict[str, int], fraction: float, seed: int = 13) -> dict[str, int]:
    rng = random.Random(seed)
    out = {}
    for w, c in counts.items():
        kept = sum(1 for _ in range(c) if rng.random() < fraction) if c < 64 else round(c * fraction)
        if kept > 0:
            out[w] = kept
    return out


def main() -> None:
    n_pieces = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    fraction = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    t0 = time.time()
    counts = synth_piece_counts(n_pieces)
    t_synth = time.time() - t0
    print(f"synth {len(counts)} distinct pieces in {t_synth:.1f}s", flush=True)
    if fraction < 1.0:
        counts = thin_counts(counts, fraction)
        print(f"thinned to {len(counts)} pieces at fraction {fraction}", flush=True)
    t0 = time.time()
    merges = train_bpe_from_counts(counts, n_merges=n_merges, min_count=2)
    t_train = time.time() - t0
    out = {
        "n_pieces": n_pieces,
        "sample_fraction": fraction,
        "n_pieces_after_sampling": len(counts),
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "train_sec": round(t_train, 1),
        "merges_per_sec": round(len(merges) / max(t_train, 1e-9), 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
