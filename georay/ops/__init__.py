"""Training-data-pipeline operators over document / embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality, token counts, fingerprints), and the
multimodal decode plumbing (stubbed decode, real Ray-side layout).
"""
