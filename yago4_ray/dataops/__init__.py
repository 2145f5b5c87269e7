"""Large-scale training-data operations over Ray Datasets.

Beyond the reference's own operators (SURVEY §2), these are the ops a
100 TB training-data pipeline needs as first-class components:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality scores, token counts, fingerprints) and
multimodal column plumbing (decode/resize/feature actor stages with the
heavy codecs stubbed in this container).
"""
