"""Spark operator for HTML table extraction (core/htmltables.py):
structured (url, table_idx, row_idx, col_idx, cell) records out of the
pages table.  Same scale shape as the main-content operators — ONE
Arrow-batched mapInPandas pass over exactly (url, html), no shuffle,
narrow rows out; embarrassingly parallel over input splits."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..core.htmltables import extract_tables

TABLES_SCHEMA = 'url string, table_idx int, row_idx int, col_idx int, cell string'


def extract_html_tables(pages: DataFrame, url_col: str = 'url', html_col: str = 'html') -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for t, r, c, cell in extract_tables(html):
                    rows.append((url, t, r, c, cell))
            yield pd.DataFrame(
                rows, columns=['url', 'table_idx', 'row_idx', 'col_idx', 'cell']
            )

    return pages.select(url_col, html_col).mapInPandas(run, schema=TABLES_SCHEMA)
