"""Logical-plan-level rewrites (API-layer equivalents of the reference's
custom DataFusion optimizer hooks)."""
