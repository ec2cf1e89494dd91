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
