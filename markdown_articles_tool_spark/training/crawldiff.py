"""Crawl diff: what changed between two crawls of the same seed set.

The month-over-month operations question — which URLs appeared,
vanished, changed content, or stayed identical — drives re-crawl
scheduling (changed pages re-crawl sooner), index invalidation, and
dedup-to-revisit decisions.  Input: one (url, digest) frame per crawl
(digest = content hash, e.g. ``sha2(text, 256)``); output: one row per
URL seen in either crawl with the verdict and both digests.

Shape: ONE full-outer equi-join on the URL — page-sized, honest,
AQE-handled; no window, no collect, no skew-prone key (URLs are
near-unique).  At 10^12 pages this is the cheapest possible formulation
of the question: both sides are already (url, digest) projections, so
the join carries two narrow columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def crawl_diff(old: DataFrame, new: DataFrame,
               url_col: str = 'url', digest_col: str = 'digest') -> DataFrame:
    """(url, change ∈ added|removed|changed|unchanged, old_sha,
    new_sha) — see module docstring."""
    a = old.select(F.col(url_col).alias('url'),
                   F.col(digest_col).alias('old_sha'))
    b = new.select(F.col(url_col).alias('url'),
                   F.col(digest_col).alias('new_sha'))
    return a.join(b, 'url', 'full_outer').select(
        'url',
        F.when(F.col('old_sha').isNull(), F.lit('added'))
        .when(F.col('new_sha').isNull(), F.lit('removed'))
        .when(F.col('old_sha') != F.col('new_sha'), F.lit('changed'))
        .otherwise(F.lit('unchanged')).alias('change'),
        'old_sha', 'new_sha',
    )
