"""Column-level functions (all JVM-side expressions or Arrow pandas UDFs)."""
