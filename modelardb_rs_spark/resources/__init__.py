"""Generated, checked-in data modules (shipped to executors as .py —
the executor zip ships only Python files, see shipping.py).

- ``bpe_vocab``: BPE merge list trained on the sf0.01 documents corpus
  by ``scripts/train_bpe_vocab.py`` (deterministic — re-running the
  script on the same corpus reproduces it byte-for-byte).
- ``bpe_pins``: per-document token counts + token-id hashes computed by
  the SLOW reference encoder (operators/bpe.py::reference_encode) at
  pin time; oracle SQL embeds them as literals so every driver run
  cross-checks the fast encoder against the reference path.
"""
