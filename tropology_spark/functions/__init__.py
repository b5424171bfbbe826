"""Scalar-function surface and cross-engine exact-arithmetic helpers."""
