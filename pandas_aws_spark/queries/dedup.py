"""Deduplication queries — filled in with dedup operators (task 5)."""
