"""Training-data pipeline operators over document/embedding tables.

All hashing is md5-based and bit-identical across Spark SQL, DuckDB SQL,
and numpy, so every operator can be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Scale-adaptive map-side parallelism for narrow-input operators.

    A small table read from one parquet file (one row group) arrives as
    a single scan task, so the heavy map work downstream — per-token
    md5, regex scans, shingle explosion — runs on ONE core no matter
    how wide the cluster is. When the input has fewer partitions than
    the cluster has task slots, hash-repartition it up to
    defaultParallelism so that work fans out; keyed by `key_col` when
    the caller aggregates on it next, so the following groupBy reuses
    this exchange instead of adding a second one.

    At scale this is a no-op: a 100 TB corpus already arrives in far
    more partitions than task slots, and the input is returned
    unchanged (no shuffle added). The repartition never changes
    results — it only redistributes rows.
    """
    sc = df.sparkSession.sparkContext
    slots = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= slots:
        return df
    from pyspark.sql import functions as F

    if key_col is not None:
        return df.repartition(slots, F.col(key_col))
    return df.repartition(slots)
