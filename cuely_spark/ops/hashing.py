"""Portable deterministic hashing shared by Spark, DuckDB, and numpy.

h60(s) = int(md5(s).hexdigest()[:15], 16)  — 60 bits, fits int64.

The reference uses specialized hashes (fnv/simhash in
crates/core/src/simhash.rs, bloom in crates/bloom/); we pin md5 because
every engine in the test loop (Spark JVM, DuckDB, Python) computes it
identically, which makes dedup/sketch operators oracle-checkable.
"""

from __future__ import annotations

import hashlib


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def h60_spark(col):
    """Spark Column: same 60-bit md5 prefix hash."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_duckdb(expr: str) -> str:
    """DuckDB SQL snippet computing the same hash for `expr`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
