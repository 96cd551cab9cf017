"""Plans: aggregates (populated incrementally)."""
