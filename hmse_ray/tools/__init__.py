"""Scalar utility models kept for reference parity (SURVEY.md A7)."""
