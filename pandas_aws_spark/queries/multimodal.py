"""Multimodal-column queries — filled in with multimodal operators (task 7)."""
