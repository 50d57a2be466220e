"""Plan-level utilities: lineage checkpoints for resumable byte-identical runs."""
