"""Similarity-search queries — filled in with similarity operators (task 6)."""
