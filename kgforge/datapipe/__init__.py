"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis (lang-ID, quality, tokens, fingerprints), and multimodal
column plumbing."""
