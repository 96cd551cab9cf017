"""Plans: setops (populated incrementally)."""
