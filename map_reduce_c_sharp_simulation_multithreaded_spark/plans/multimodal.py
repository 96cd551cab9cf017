"""Plans: multimodal (populated incrementally)."""
