"""Query registry: every SURVEY.md §2 operator as a named (spark,
sf_dir) → DataFrame callable plus its DuckDB oracle SQL."""
