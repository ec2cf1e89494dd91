"""Distributed Bloom-filter build + incremental dedup probe.

The month-over-month crawl problem: today's batch must be deduped
against EVERY digest ever crawled.  An exact anti-join against the
historical digest table re-shuffles a corpus-sized table per
increment; the standard engineering answer is a Bloom filter over the
historical digests — a few bytes per historical doc, built once,
broadcast to every executor, probed scan-side with zero shuffle.
False positives drop a small, tunable fraction of genuinely-new docs
(acceptable: dedup is lossy-by-design in that direction); false
negatives are impossible, so nothing duplicate ever slips through a
"novel" verdict.

Spec (frozen — the sequential oracle twin replays it bit-for-bit):

* base hash  ``h = xxhash64(key, seed=42)`` — Spark's built-in JVM
  xxhash64 over the string's UTF-8 bytes (the same function whose
  stdlib twin is pinned bit-identical in tests/test_checkpoint.py);
* double hashing (Kirsch-Mitzenmacher): with ``u`` = h as unsigned,
  ``h1 = u >> 32``, ``h2 = u & 0xffffffff``,
  ``pos_i = (h1 + i*h2) mod m_bits`` for i in 0..k-1 — ONE hash
  evaluation yields all k probe positions with exact 64-bit integer
  arithmetic (no second hash pass, no float anywhere);
* the filter is an array of m_bits/64 little-endian 64-bit words;
  bit ``pos`` lives in word ``pos >> 6`` at offset ``pos & 63``.

Build shape at 10^12 docs: explode k positions per digest → word/mask
projection → ``groupBy(word).agg(bit_or(mask))`` — a map-side-combined
aggregate whose output is AT MOST m_bits/64 rows regardless of corpus
size (the classic bounded-state sketch), collected once and broadcast.
Probe shape: positions computed JVM-side (the authoritative xxhash64),
bit tests in ONE vectorized Arrow pass against the broadcast word
array — no join, no shuffle.

Sizing: FP rate ≈ (1 - e^(-k·n/m))^k; k=5, m=10n gives ~0.9%.  At
10^10 historical docs and 12 bits/doc the filter is ~15 GB — chunk it
(build per digest-prefix partition, probe each chunk's docs against
its own chunk) if executor memory can't hold it; the build aggregate
below already parallelizes regardless.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5
_U32 = 0xFFFFFFFF


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k probe positions as JVM integer Column algebra."""
    h = F.xxhash64(key)
    # unsigned views of the signed 64-bit hash: >>> is sign-free, the
    # low mask is sign-free by construction
    hi = F.shiftrightunsigned(h, 32)
    lo = h.bitwiseAND(F.lit(_U32))
    return [
        F.pmod(hi + F.lit(i) * lo, F.lit(int(m_bits))).cast('long')
        for i in range(int(k_hashes))
    ]


def bloom_words_df(
    df: DataFrame,
    key_col: str = 'digest',
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> DataFrame:
    """The distributed build: (word_idx, bits) rows, at most
    m_bits/64 of them — ``bit_or`` is map-side combined, so a
    corpus-sized digest stream collapses to filter-sized state before
    the one bounded exchange."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k_hashes))).alias('pos')
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col('pos'), 6).cast('long').alias('word'),
            F.expr('shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))').alias('mask'),
        )
        .groupBy('word')
        .agg(F.expr('bit_or(mask)').alias('bits'))
    )


def build_bloom(
    df: DataFrame,
    key_col: str = 'digest',
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> np.ndarray:
    """Materialize the filter driver-side: an int64 word array of
    exactly m_bits/64 entries (bounded by the PARAMETER, not the
    data — the collect is filter-sized)."""
    words = np.zeros(m_bits // 64, dtype=np.int64)
    for r in bloom_words_df(df, key_col, m_bits, k_hashes).collect():
        words[r['word']] = r['bits']
    return words


def bloom_probe(
    df: DataFrame,
    bloom: np.ndarray,
    key_col: str = 'digest',
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
    out_col: str = 'novel',
) -> DataFrame:
    """Adds ``out_col``: True iff the key is NOT in the filter
    (definitely new), False iff all k bits are set (seen before, or a
    false positive).  Positions come from the same JVM xxhash64
    algebra as the build; the bit tests run in one vectorized Arrow
    pass against the broadcast word array."""
    sc = df.sparkSession.sparkContext
    b_words = sc.broadcast(np.ascontiguousarray(bloom, dtype=np.int64))
    k = int(k_hashes)

    @F.pandas_udf('boolean')
    def probe(pos_arrays: pd.Series) -> pd.Series:
        words = b_words.value
        if len(pos_arrays) == 0:
            return pd.Series([], dtype=bool)
        p = np.stack([np.asarray(a, dtype=np.int64) for a in pos_arrays])
        # arithmetic >> keeps bit 0 of the shifted value intact, so
        # signed int64 words test correctly
        hit = (words[p >> 6] >> (p & 63)) & 1
        return pd.Series(~hit.all(axis=1))

    pos_arr = F.array(*_positions(F.col(key_col), m_bits, k_hashes))
    return df.withColumn(out_col, probe(pos_arr))


def bloom_dedup(
    old: DataFrame,
    new: DataFrame,
    key_col: str = 'digest',
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
) -> DataFrame:
    """The composed increment: build the filter over the historical
    keys, probe the new batch, return it with the ``novel`` verdict
    attached (filter ``WHERE novel`` for the kept rows; keeping the
    column makes the FP behavior auditable)."""
    bloom = build_bloom(old, key_col, m_bits, k_hashes)
    return bloom_probe(new, bloom, key_col, m_bits, k_hashes)


def save_bloom(df: DataFrame, path: str, key_col: str = 'digest',
               m_bits: int = DEFAULT_M_BITS, k_hashes: int = DEFAULT_K) -> None:
    """Publish the filter as an artifact: the bounded (word, bits)
    rows plus a one-row ``_meta`` table pinning (m_bits, k_hashes) —
    a probe against a published filter MUST use the build's exact
    geometry or every verdict is garbage, so the geometry travels
    with the bits."""
    spark = df.sparkSession
    bloom_words_df(df, key_col, m_bits, k_hashes).write.mode(
        'overwrite').parquet(f'{path}/words')
    spark.createDataFrame(
        [(int(m_bits), int(k_hashes))], 'm_bits long, k_hashes int'
    ).coalesce(1).write.mode('overwrite').parquet(f'{path}/_meta')


def load_bloom(spark, path: str):
    """(words ndarray, m_bits, k_hashes) from a published filter."""
    meta = spark.read.parquet(f'{path}/_meta').collect()[0]
    m_bits, k_hashes = int(meta['m_bits']), int(meta['k_hashes'])
    words = np.zeros(m_bits // 64, dtype=np.int64)
    for r in spark.read.parquet(f'{path}/words').collect():
        words[r['word']] = r['bits']
    return words, m_bits, k_hashes


def bloom_dedup_cogrouped(
    old: DataFrame,
    new: DataFrame,
    key_col: str = 'digest',
    n_chunks: int = 16,
    m_bits_per_chunk: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K,
    out_col: str = 'novel',
) -> DataFrame:
    """The executor-memory-bounded form of ``bloom_dedup`` — for the
    regime where ONE filter no longer broadcasts (10^10 historical
    docs ~ 15 GB at 12 bits/doc): the key space splits into
    ``n_chunks`` by ``pmod(xxhash64(key), n_chunks)``, both sides
    co-shuffle on the chunk id, and each chunk builds + probes its own
    ``m_bits_per_chunk`` filter inside one ``cogroup.applyInPandas``
    task.  No broadcast, no driver materialization; filter memory per
    task is m_bits_per_chunk/8 REGARDLESS of corpus size, and total
    filter capacity scales with n_chunks.

    The position spec is IDENTICAL to the broadcast form — the base
    hash is Spark's own ``xxhash64`` computed JVM-side BEFORE the
    cogroup (it rides the shuffle as a column), and the
    Kirsch-Mitzenmacher expansion runs on those values in numpy —
    so equal keys always share a chunk AND positions: false negatives
    remain impossible by construction.  The one exchange per side is
    hash-partitioned on the chunk id; chunk skew is bounded by the
    hash (uniform key spread).

    Returns the ``new`` rows (original columns) plus ``out_col``.
    """
    n_chunks = int(n_chunks)
    m = int(m_bits_per_chunk)
    k = int(k_hashes)
    h = F.xxhash64(F.col(key_col))
    chunk = F.pmod(h, F.lit(n_chunks)).alias('_chunk')
    old_c = old.select(h.alias('_h'), chunk)
    new_c = new.withColumn('_h', h).withColumn('_chunk', chunk)
    out_fields = [f for f in new.schema.fields]
    out_schema = ', '.join(
        f'{f.name} {f.dataType.simpleString()}' for f in out_fields
    ) + f', {out_col} boolean'

    def _pos_matrix(hs: np.ndarray) -> np.ndarray:
        """(n, k) position matrix from signed int64 base hashes —
        the same unsigned h1/h2 split as the Column algebra, in
        uint64 numpy (wraparound-exact)."""
        u = hs.astype(np.uint64)
        h1 = (u >> np.uint64(32)).astype(np.int64)
        h2 = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return np.stack(
            [(h1 + i * h2) % m for i in range(k)], axis=1)

    def probe_chunk(left_new: pd.DataFrame, right_old: pd.DataFrame) -> pd.DataFrame:
        out = left_new.drop(columns=['_h', '_chunk'])
        if left_new.empty:
            out[out_col] = pd.Series([], dtype=bool)
            return out
        words = np.zeros(m // 64, dtype=np.int64)
        if not right_old.empty:
            p = _pos_matrix(right_old['_h'].to_numpy(np.int64)).ravel()
            np.bitwise_or.at(words, p >> 6, np.int64(1) << (p & 63))
        q = _pos_matrix(left_new['_h'].to_numpy(np.int64))
        hit = (words[q >> 6] >> (q & 63)) & 1
        out[out_col] = ~hit.all(axis=1)
        return out

    return (
        new_c.groupBy('_chunk')
        .cogroup(old_c.groupBy('_chunk'))
        .applyInPandas(lambda lnew, rold: probe_chunk(lnew, rold),
                       schema=out_schema)
    )
