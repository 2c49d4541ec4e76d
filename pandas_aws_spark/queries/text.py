"""Text-analysis queries — filled in with text operators (task 7)."""
