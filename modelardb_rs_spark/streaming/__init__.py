"""Structured Streaming ingestion (the reference's buffering ingest
pipeline re-expressed as micro-batch compression jobs)."""
