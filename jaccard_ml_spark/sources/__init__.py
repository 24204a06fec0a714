"""Sources: schemas, readers, and the deterministic synthetic generator."""
