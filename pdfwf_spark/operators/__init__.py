"""Spark operators: extraction UDF, ordering, partitioning, lineage,
resume, plus training-data-pipeline ops (dedup, similarity, text
stats, multimodal plumbing)."""
