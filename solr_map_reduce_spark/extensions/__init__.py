"""Beyond-reference operators for large-scale training-data pipelines:
text dedup (exact/minhash-LSH/simhash/ngram-jaccard), similarity search,
text analysis, multimodal column plumbing.  First-class engine components
(BASELINE.json north star), designed for 100 TB inputs."""
