"""Sequence packing: assign documents to fixed-token-budget training
shards by a deterministic global token prefix-sum.

Pretraining consumes documents as one continuous token stream cut into
fixed-size contexts; the shard a document STARTS in is
``floor(start_offset / budget)`` where ``start_offset`` is the running
token total over the canonical corpus order (here: ascending id).

The naive Spark spelling — ``SUM(tokens) OVER (ORDER BY id)`` with no
partition key — moves the ENTIRE corpus into one task (a global
window has a single partition): the textbook scale anti-pattern.  The
scale-correct shape is a two-level distributed prefix sum:

1. range-partition + sort by id (the canonical order, one exchange);
2. per-partition token totals — a tiny (n_partitions)-row aggregate;
3. exclusive prefix over those totals via a window over the TINY
   frame (single-partition is fine at n_partitions rows);
4. broadcast-join the per-partition base back and add the
   within-partition running sum (window PARTITIONED by the range
   partition id — no global sort).

The result is independent of the partition count — the bases absorb
wherever the range boundaries land — which the tests pin by comparing
2-, 7- and 32-partition runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = 'doc_id',
    tokens_col: str = 'n_tokens',
) -> DataFrame:
    """(id, n_tokens) → (id, n_tokens, start_offset, shard) with
    shard = floor(start_offset / budget) over ascending-id order."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.select(F.col(id_col).alias('_id'), F.col(tokens_col).alias('_tok'))
        .repartitionByRange(parts, '_id')
        .sortWithinPartitions('_id')
        .withColumn('_pid', F.spark_partition_id())
    )
    totals = ordered.groupBy('_pid').agg(F.sum('_tok').alias('_ptotal'))
    # exclusive prefix over the tiny per-partition totals frame
    wp = Window.orderBy('_pid').rowsBetween(Window.unboundedPreceding, -1)
    bases = totals.withColumn('_base', F.coalesce(F.sum('_ptotal').over(wp), F.lit(0)))
    ww = Window.partitionBy('_pid').orderBy('_id')
    return (
        ordered.join(F.broadcast(bases.select('_pid', '_base')), '_pid')
        .withColumn('_cum', F.sum('_tok').over(ww))
        .select(
            F.col('_id').alias(id_col),
            F.col('_tok').cast('long').alias(tokens_col),
            (F.col('_base') + F.col('_cum') - F.col('_tok')).cast('long').alias('start_offset'),
            F.floor((F.col('_base') + F.col('_cum') - F.col('_tok')) / budget)
            .cast('long').alias('shard'),
        )
    )
