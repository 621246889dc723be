"""Structured Streaming operators (optional demo path, SURVEY.md §2.10)."""
