"""Sources: deterministic synthetic inputs + parquet IO helpers."""
