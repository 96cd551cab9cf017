"""Plans: similarity (populated incrementally)."""
