"""Warehouse upsert/merge queries — filled in with warehouse module (task 4)."""
