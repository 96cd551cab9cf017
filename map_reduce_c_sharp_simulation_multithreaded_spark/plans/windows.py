"""Plans: windows (populated incrementally)."""
