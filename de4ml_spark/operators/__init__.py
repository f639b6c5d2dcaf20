"""Extension-tier operators for large-scale training-data pipelines:
deduplication, similarity search, text analysis, sessionization, multimodal
column plumbing (BASELINE.json north star; SURVEY.md §7.3 M5)."""
