"""Scalar/aggregate function helpers."""
