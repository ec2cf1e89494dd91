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


# 2^32 as an exact double: the hash-prefix key space (first 8 hex chars
# of sha256).  All threshold arithmetic below is a short chain of
# IEEE-754 correctly-rounded operations (exact multiply of two exact
# doubles, sqrt, divide, floor) — bit-identical in every IEEE engine
# (JVM, DuckDB, numpy), unlike pow(), whose libm results differ across
# runtimes.  That is why the temperature is FIXED at alpha = 1/2.
_HASH_SPACE = 4294967296.0


def lang_rebalance(
    df: DataFrame,
    lang_col: str = 'lang',
    id_col: str = 'doc_id',
    k: int = 8,
) -> DataFrame:
    """Language rebalancing for multilingual training corpora — the
    mC4 / CCNet temperature-sampling shape at alpha = 1/2, expressed
    as a PER-DOC hash-threshold decision so the selection is exact,
    order-free, and engine-portable.

    Every doc is kept with probability min(1, k / sqrt(n_lang)):
    expected kept count per language = k * sqrt(n_lang), the alpha=0.5
    rebalancing curve (head languages downsampled toward sqrt, tail
    languages kept whole).  The decision is ``hash_prefix(id) <
    threshold(lang)`` — a pure function of document identity, so
    re-runs, re-partitions and incremental appends keep the SAME docs
    (the dataset_split property, per-language).

    Distribution shape: one tiny per-language count aggregation
    (map-side combined), a broadcast join of the language dim back
    onto the corpus, and a scan-side filter — no corpus-sized shuffle
    at any step, no window, no rank.  Selecting an EXACT quota would
    need a per-language rank (a corpus shuffle + a mega-group for the
    head language); the Bernoulli threshold trades +-sqrt-noise quota
    precision for a shuffle-free plan, which is the right trade at
    10^12 docs.

    Exactness contract (what the DuckDB oracle replays verbatim):
    threshold = floor((2^32 * k) / sqrt(n_lang)) rendered as 8 lowercase
    hex digits, compared LEXICOGRAPHICALLY against the first 8 hex
    chars of sha256(id as string) — identical to the numeric compare
    because both sides are fixed-width lowercase hex.  Languages with
    n_lang <= k^2 (rate >= 1) are kept whole via an integer guard, so
    the hex rendering never exceeds 8 digits.
    """
    counts = df.groupBy(lang_col).agg(F.count('*').alias('lang_count'))
    n = F.col('lang_count').cast('double')
    thr = F.floor(F.lit(_HASH_SPACE * float(k)) / F.sqrt(n)).cast('long')
    dim = counts.select(
        lang_col,
        'lang_count',
        F.format_string('%08x', thr).alias('_thr_hex'),
        (F.col('lang_count') <= F.lit(int(k) * int(k))).alias('_keep_all'),
    )
    hkey = F.substring(F.sha2(F.col(id_col).cast('string'), 256), 1, 8)
    return (
        df.join(F.broadcast(dim), lang_col)
        .where(F.col('_keep_all') | (hkey < F.col('_thr_hex')))
        .select(id_col, lang_col, 'lang_count')
    )


def dataset_shards(
    df: DataFrame,
    id_col: str = 'doc_id',
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic global shuffle + equal shard packing — the
    dataset-publication op: training docs must be (a) shuffled (SGD
    hates crawl order: a host's pages arrive together), (b) packed
    into N near-equal shards, and (c) REPRODUCIBLY so — re-running the
    job, repartitioning the input, or appending then re-publishing
    must yield byte-identical shards, or downstream training runs
    diverge irreproducibly.

    Shuffle order = (bucket, id) with ``bucket`` the content-addressed
    16-bit sha256 bucket (``id_bucket`` — the dataset_split identity
    hash): a pure function of identity, independent of input order and
    partitioning.  Rank under that order comes from
    ``util.global_rank`` — the two-level prefix-count machinery, never
    a single-partition global window.  Packing is exact integer
    arithmetic:

        shard = (rank-1) * n_shards DIV total
        pos   = (rank-1) - (shard * total + n_shards - 1) DIV n_shards

    (shard sizes differ by at most 1; both formulas are pure integer
    ops, so the DuckDB oracle — its OWN row_number window plus the
    same arithmetic — must agree bit-for-bit, independently checking
    the distributed ranking.)

    Returns (id, bucket, shard, pos).
    """
    from .util import global_rank

    src = df.select(id_col).withColumn('bucket', id_bucket(F.col(id_col)))
    ranked = global_rank(src, ['bucket', id_col], rank_col='_rank',
                         total_col='_total')
    n = int(n_shards)
    shard = F.expr(f'(_rank - 1) * {n} DIV _total')
    pos = F.expr(f'(_rank - 1) - ((((_rank - 1) * {n} DIV _total) * _total '
                 f'+ {n} - 1) DIV {n})')
    return ranked.select(
        id_col,
        'bucket',
        shard.cast('int').alias('shard'),
        pos.cast('long').alias('pos'),
    )
