"""Dataflow operators (SURVEY §2.A): routing, dedup, keys, file metadata,
randomization."""
