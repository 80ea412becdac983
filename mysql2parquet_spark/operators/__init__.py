"""Engine operators beyond plain relational algebra.

- dedup: exact, fingerprint, MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup
- similarity: brute-force and LSH-bucketed top-k cosine search
- text: tokenization, language-ID heuristic, quality scoring, fingerprints
- multimodal: binary-column conventions + mapInPandas plumbing

The reference has none of these (it is a MySQL→Parquet exporter,
/root/reference/main.go); they are the Tier C north-star extensions
(SURVEY.md §2.3) that make the engine useful as a 100 TB training-data
pipeline.
"""
