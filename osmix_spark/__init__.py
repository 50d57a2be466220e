"""osmix_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of conveyal/osmix
(reference: /root/reference, snapshot 2026-07-23) as idiomatic Spark
DataFrame operators: cell-partitioned two-phase spatial joins, merge/dedupe
with osmix's exact survivor semantics, z/x/y tile materialization, plus the
large-scale text-pipeline operators (dedup, similarity search, quality
scoring) a Common-Crawl-style corpus needs.

Layout (mirrors the reference's package layering, SURVEY.md §0):

- functions/  scalar kernels: geo math, text metrics, portable hashing
- sources/    deterministic fixture generators + geotagging ingest
- operators/  spatial joins, merge/dedupe, tiling, corpus dedup, ANN
- plans/      lineage checkpoints for resumable byte-identical re-runs
- streaming/  incremental page ingest (Structured Streaming)
"""

__version__ = "0.1.0"
