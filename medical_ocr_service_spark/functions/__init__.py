"""Column-expression helpers and Arrow pandas UDFs (the only Python on executors)."""
