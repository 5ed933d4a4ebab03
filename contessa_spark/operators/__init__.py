"""Large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) — the operations a 100 TB
training-data pipeline needs beyond the reference's rule engine."""
