"""Training-data pipeline operators over document/embedding tables.

All hashing is md5-based and bit-identical across Spark SQL, DuckDB SQL,
and numpy, so every operator can be oracle-checked.
"""
