"""Reusable operator implementations composed by the query plans."""
