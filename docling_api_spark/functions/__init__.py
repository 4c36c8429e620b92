"""Column-function library (pure Catalyst expressions, no UDFs)."""
