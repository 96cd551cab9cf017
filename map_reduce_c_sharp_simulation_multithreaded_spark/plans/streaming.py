"""Plans: streaming (populated incrementally)."""
