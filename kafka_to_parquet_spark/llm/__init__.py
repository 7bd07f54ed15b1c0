"""LLM-training-data pipeline operators (SURVEY §2.11, north star):

- dedup.py — exact (hash group-by), n-gram Jaccard, SimHash,
  MinHash-LSH, embedding-cosine near-dup;
- similarity.py — brute-force cosine top-k + IVF-partitioned variant;
- multimodal.py — opaque binary media columns with typed metadata,
  Arrow-batched decode/feature plumbing.

Scale doctrine shared by all of them: never pairwise-compare the full
corpus. Candidate generation is always a hash/blocking/bucketing step
(sha2 group-by, LSH bands, blocking keys, IVF cells) so the quadratic
comparison only ever runs inside a bounded bucket, and the heavy side
never collects to the driver.
"""
