"""Shared helpers for the training-data operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Give CPU-heavy per-row stages cluster-width parallelism even
    when the input arrives as a handful of scan partitions.

    Scan partitioning follows file splits; a small table (one parquet
    file, one row group) reads as ONE partition, which serializes every
    downstream sketch/UDF stage on a single core (measured: the sf0.1
    minhash stage ran 3.2 s single-partition vs 1.0 s at width 16).
    Repartition ONLY when the scan is narrower than the cluster — a
    production-scale input has thousands of splits, the condition is
    false, and no shuffle is added.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
