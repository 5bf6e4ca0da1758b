"""DuckDB oracle SQL builders, split by engine domain (see oracle.py)."""
