"""Plans: joins (populated incrementally)."""
