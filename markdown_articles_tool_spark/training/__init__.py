"""Training-data pipeline operators (first-class, beyond the reference).

What a 100 TB web-text corpus pipeline needs around the extraction
engine: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force and LSH-bucketed
ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.
"""
