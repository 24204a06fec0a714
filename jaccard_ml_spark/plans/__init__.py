"""End-to-end pipelines, checkpointing, lineage, and the oracle."""
