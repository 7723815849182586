"""Structured Streaming ingest — an engine extension (the reference is
batch-only; SURVEY §1.4)."""
