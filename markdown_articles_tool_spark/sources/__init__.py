"""Crawl-interchange source tier: readers that turn raw crawl-archive
blobs (WARC) into the engine's page tables."""
