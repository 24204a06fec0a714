"""Incremental / streaming-adjacent operators.

The reference is batch-only (SURVEY §2.9); the north rule requires
checkpoint-resume, not Structured Streaming. This package holds the
incremental-batch idiom: dedup new Iceberg snapshots against the
standing signature table via MERGE-style joins.
"""
