"""Spark operator for sitemap parsing (core/sitemap.py): flattened
(host, ord, kind, loc, lastmod, changefreq, priority) records out of
the per-host sitemap dim — one mapInPandas pass, no shuffle.  At real
scale the sitemap fetch rides the ordinary fetch stage (sitemaps are
URLs the robots records name); parsing stays embarrassingly parallel
per file either way."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.sitemap import sitemap_entries

SITEMAP_ENTRIES_SCHEMA = (
    'host string, ord int, kind string, loc string, lastmod string, '
    'changefreq string, priority string'
)


def extract_sitemap_entries(sitemaps: DataFrame, host_col: str = 'host',
                            xml_col: str = 'sitemap_xml') -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, xml in zip(pdf[host_col], pdf[xml_col]):
                for rec in sitemap_entries(xml):
                    rows.append((host, *rec))
            yield pd.DataFrame(
                rows, columns=['host', 'ord', 'kind', 'loc', 'lastmod',
                               'changefreq', 'priority']
            )

    return sitemaps.select(host_col, xml_col).mapInPandas(
        run, schema=SITEMAP_ENTRIES_SCHEMA)
