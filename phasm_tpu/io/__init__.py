"""I/O & interchange layer (ref: phasm/io/ — SURVEY.md §2 L1)."""
