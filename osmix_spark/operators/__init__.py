"""Distributed operators: spatial joins, merge/dedupe, tiling, corpus ops."""
