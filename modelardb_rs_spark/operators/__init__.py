"""Spark-side operators: compression, gridding, segment aggregates, and
the LLM-data-pipeline operator family (dedup, similarity, text analysis,
multimodal plumbing)."""
