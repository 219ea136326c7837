"""Scale-out extensions beyond the reference surface (BASELINE.json
north star): deduplication, similarity search, text analysis, and
multimodal-column plumbing for large-scale training-data pipelines.

Design stance for 100 TB: every operator is expressed as shuffle-keyed
DataFrame transformations (no driver-side collects, no cross joins
against the full corpus); candidate generation always goes through a
bucketing key (minhash band, LSH bucket, IVF cell) so the expensive
pairwise work only happens inside buckets.
"""
