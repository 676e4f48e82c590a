"""Deduplication operators for training-data pipelines (SURVEY.md §2.10).

- exact:     hash-groupBy exact text dedup (L1)
- ngram:     token/shingle Jaccard similarity self-join (exact, bounded)
- minhash:   MinHash + LSH banding near-dedup (L2, the 100 TB path)
- simhash:   64-bit SimHash + banded Hamming candidate search
- embedding: random-hyperplane LSH near-dup over embedding vectors
- cluster:   connected components over dup pairs → canonical doc per cluster
"""
