"""Plans: dedup (populated incrementally)."""
