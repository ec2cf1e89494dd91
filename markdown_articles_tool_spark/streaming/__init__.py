"""Incremental processing.

The reference has no streaming concept (SURVEY.md §2.7); incremental
semantics in this engine are batch-incremental (checkpoint.py).  This
package adds the Structured-Streaming ingest shape for corpora that
arrive continuously (new parquet files landing in a directory).
"""
