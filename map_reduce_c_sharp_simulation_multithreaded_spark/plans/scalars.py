"""Plans: scalars (populated incrementally)."""
