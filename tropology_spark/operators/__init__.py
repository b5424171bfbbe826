"""Operator modules; importing them registers declared queries."""
