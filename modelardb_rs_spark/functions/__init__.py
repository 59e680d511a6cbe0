"""Scalar/column function helpers shared by the operator family."""
