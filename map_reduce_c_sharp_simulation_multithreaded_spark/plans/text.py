"""Plans: text (populated incrementally)."""
