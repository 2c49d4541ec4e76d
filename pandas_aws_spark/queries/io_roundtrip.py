"""I/O round-trip queries — filled in with objectstore module (task 3)."""
