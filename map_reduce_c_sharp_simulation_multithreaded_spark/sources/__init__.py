"""Data sources/sinks (reference CSV dialect, parquet helpers)."""
