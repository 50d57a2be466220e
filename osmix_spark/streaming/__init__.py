"""Structured Streaming: incremental page ingest + windowed rollups."""
