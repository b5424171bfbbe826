"""Placeholder — filled in a later stage."""
