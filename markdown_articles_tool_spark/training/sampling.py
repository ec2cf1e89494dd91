"""Deterministic content-addressed sampling / dataset splitting.

A 100-TB pipeline cannot use ``df.sample()`` for train/val/test
splits: RDD sampling is seed- and partitioning-dependent, so the split
changes when the input is re-partitioned, backfilled, or re-run — and
a document's assignment must be a pure function of its IDENTITY, or
retraining after an incremental crawl leaks validation docs into
train.  The standard fix: hash the id, bucket the hash, cut buckets by
the requested fractions.

bucket(id) = first 16 bits of sha256(id as string) — portable to any
engine (the DuckDB twin is ('0x' || substr(sha256(id), 1, 4))::INT),
uniform, and independent of row order, partitioning and scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BUCKETS = 1 << 16


def id_bucket(id_col: Column) -> Column:
    """Uniform 0..65535 bucket from sha256 of the STRING form of the id."""
    return F.conv(F.substring(F.sha2(id_col.cast('string'), 256), 1, 4), 16, 10).cast('int')


def hash_sample(df: DataFrame, rate: float, id_col: str = 'doc_id') -> DataFrame:
    """Deterministic ``rate``-fraction sample: keep ids whose bucket
    falls below floor(rate * 65536).  Re-runs, re-partitions and
    incremental appends all sample the SAME ids."""
    return df.where(id_bucket(F.col(id_col)) < int(rate * N_BUCKETS))


def dataset_split(
    df: DataFrame,
    id_col: str = 'doc_id',
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Adds ``bucket`` and ``split`` ('train' | 'val' | 'test') columns.
    Cut points are floor(fraction * 65536), so the assignment is exact,
    stable, and identical in every engine that can hash sha256."""
    b = id_bucket(F.col(id_col))
    t_cut = int(train * N_BUCKETS)
    v_cut = int((train + val) * N_BUCKETS)
    split = (
        F.when(b < t_cut, F.lit('train'))
        .when(b < v_cut, F.lit('val'))
        .otherwise(F.lit('test'))
    )
    return df.withColumn('bucket', b).withColumn('split', split)
