"""Sharded CDX index layout + pruned lookup — the queryable form of
the merged index (the Common-Crawl publication shape: sorted
``cdx-00000..cdx-NNNNN`` shards plus a tiny ``cluster.idx`` that maps
key ranges to shards, so a point lookup touches ONE shard out of
thousands instead of scanning the crawl).

Spark-native translation:

* ``write_cdx_index`` range-partitions the CDX rows by
  ``(surt, file_name, ord)`` and sorts within partitions, writing one
  parquet file per shard — globally SURT-ordered storage, built
  entirely distributed (the same two-level machinery as
  ``training/util.global_rank``; no single-task sort anywhere);
* a ``_boundaries`` side table (the ``cluster.idx`` analog) records
  each shard file's (lo, hi) surt range from a cheap post-write scan;
* ``lookup_surt`` reads the tiny boundary table, selects ONLY the
  shard files whose range covers the key, and scans just those —
  plus parquet row-group min/max stats prune WITHIN the shard because
  the rows are sorted.  At web scale that is a thousands-of-shards
  index answering a URL lookup from one file.

Driver-checked as the ``cdx_lookup`` query: the metadata records'
SURT-trap spellings (corpus._messy_target) must find their host's
records through the index — the operational proof of the SURT-collapse
property (``HTTPS://WWW.Example.COM:443/A?b=2&a=1`` finds
``https://example.com/a?a=1&b=2``'s records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

KEY_COLS = ('surt', 'file_name', 'ord')


def write_cdx_index(cdx: DataFrame, path: str, n_shards: int | None = None) -> None:
    """Write the range-partitioned, SURT-sorted shard layout plus the
    ``_boundaries`` table.  ``n_shards`` defaults to the cluster
    parallelism (production: size so a shard is a few hundred MB)."""
    spark = cdx.sparkSession
    n = n_shards or spark.sparkContext.defaultParallelism
    (
        cdx.repartitionByRange(n, *[F.col(c) for c in KEY_COLS])
        .sortWithinPartitions(*KEY_COLS)
        .write.mode('overwrite').parquet(f'{path}/shards')
    )
    # cluster.idx analog: one (file, lo, hi) row per written shard —
    # a cheap narrow scan over just the surt column at build time
    (
        spark.read.parquet(f'{path}/shards')
        .select(F.input_file_name().alias('shard'), 'surt')
        .groupBy('shard')
        .agg(F.min('surt').alias('lo'), F.max('surt').alias('hi'))
        .coalesce(1)
        .write.mode('overwrite').parquet(f'{path}/_boundaries')
    )


def covering_shards(spark: SparkSession, path: str, key: str) -> list:
    """The shard files whose (lo, hi) range covers ``key`` — the
    boundary table is tiny (one row per shard), read driver-side like
    any secondary index."""
    rows = spark.read.parquet(f'{path}/_boundaries').collect()
    return sorted(r['shard'] for r in rows if r['lo'] <= key <= r['hi'])


def lookup_surt(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Point lookup: boundary-prune to the covering shard file(s),
    scan only those, filter ``surt == key`` (pushed to the parquet
    row groups, which are sorted — min/max stats prune within the
    shard too).  Empty DataFrame when no shard covers the key."""
    files = covering_shards(spark, path, key)
    if not files:
        return spark.read.parquet(f'{path}/shards').where(F.lit(False))
    return spark.read.parquet(*files).where(F.col('surt') == key)
