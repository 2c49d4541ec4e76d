"""Column-level function helpers (all JVM-side built-in compositions)."""
