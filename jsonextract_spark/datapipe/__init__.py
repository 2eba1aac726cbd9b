"""Training-data pipeline operators over the corpus tables.

Everything a 100 TB web-text pipeline needs downstream of the crawl:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, and multimodal column
plumbing. All operators are DataFrame-native; Python appears only inside
Arrow-batched UDFs.
"""
