"""Scalar function kernels (JVM-side Column expressions wherever possible)."""
