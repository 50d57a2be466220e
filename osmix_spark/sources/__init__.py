"""Deterministic sources: synthetic layer derivation + fixture generators."""
