"""Plan-shape assertion helpers."""
