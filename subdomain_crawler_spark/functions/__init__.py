"""Vectorized kernel layer: pure-python semantic core + pandas_udf wrappers.

``core``/``psl``/``image``/``text`` have no Spark dependency so unit tests pin
semantics without a SparkSession; ``udfs`` wraps them for DataFrame plans.
"""
