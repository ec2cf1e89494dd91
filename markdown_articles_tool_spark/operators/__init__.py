"""Spark-side operators: vectorized pandas UDFs + plan fragments."""
