"""Large-scale training-data pipeline operators.

Beyond the reference's own dataflow (SURVEY.md §2), these are the operations
a 100 TB training-data pipeline needs: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), approximate similarity search,
text analysis (language ID, quality scoring, token counting, fingerprinting)
and multimodal binary-column plumbing. All DataFrame-first; Python only in
vectorized pandas UDFs.
"""
