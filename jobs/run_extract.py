#!/usr/bin/env python
"""Production entry point for main-content extraction (the north-rule
boilerplate-strip family) via spark-submit.

    spark-submit --py-files mats.zip jobs/run_extract.py \
        --input  /path/to/pages/        # parquet/Iceberg: (url, warc_ts, html, text, lang)
        --output /path/to/out/          \
        --spans                         # also write per-block span rows
        --stream                        # incremental: process only new files, exactly-once

Batch mode writes ``out/main_content`` (url, main_text, n_blocks,
n_kept); ``--spans`` adds ``out/content_spans``.  ``--stream`` runs the
same extraction as a native Structured-Streaming transform with an
``availableNow`` trigger: each invocation drains exactly the files not
yet processed (state in ``out/_mc_checkpoint``) — the cron-friendly
shape for a continuously-landing crawl.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--spans', action='store_true')
    ap.add_argument('--stream', action='store_true')
    args = ap.parse_args()

    from markdown_articles_tool_spark.session import get_spark

    spark = get_spark(app_name='mats-extract')

    if args.stream:
        from markdown_articles_tool_spark.streaming.incremental import (
            start_incremental_main_content,
        )

        q = start_incremental_main_content(spark, args.input, args.output)
        q.awaitTermination()
        print('stream drained')
    else:
        from markdown_articles_tool_spark.operators.maincontent import (
            extract_content_spans,
            extract_main_content,
        )

        pages = spark.read.parquet(args.input)
        extract_main_content(pages).write.mode('overwrite').parquet(
            f'{args.output}/main_content'
        )
        if args.spans:
            extract_content_spans(pages).write.mode('overwrite').parquet(
                f'{args.output}/content_spans'
            )
        n = spark.read.parquet(f'{args.output}/main_content').count()
        print(f'extracted {n} documents')
    spark.stop()


if __name__ == '__main__':
    main()
