"""Streaming layer (SURVEY.md §2 K)."""
