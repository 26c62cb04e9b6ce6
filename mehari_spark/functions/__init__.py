"""Column-expression helpers (pure Catalyst expressions, no UDFs)."""
