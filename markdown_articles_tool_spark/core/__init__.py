"""Pure-Python semantic core shared by the oracle and the Spark UDFs."""
