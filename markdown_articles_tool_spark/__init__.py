"""PySpark-native article-extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
``artiomn/markdown_articles_tool`` (reference at /root/reference,
studied for behavior only): CommonMark-style image-link extraction,
cluster-wide image dedup, deterministic link rewriting — expressed as
DataFrame plans with vectorized pandas/Arrow UDFs, plus the
training-data operators a 100 TB corpus pipeline needs (near-dup
detection, similarity search, text quality stats).
"""

__version__ = '0.1.0'
