"""Large-scale training-data pipeline operators (beyond the reference).

Deduplication, similarity search, text analysis, and multimodal plumbing
over the driver's ``documents`` / ``embeddings`` tables — designed for the
100 TB posture: hash-partitioned groupBys, broadcast of tiny sides,
banded LSH instead of all-pairs joins, no driver-side loops.
"""
