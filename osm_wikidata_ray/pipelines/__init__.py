"""End-to-end pipelines: record linkage, training-data ops, multimodal."""
