"""Reusable Spark operators the engine adds beyond Catalyst built-ins:
as-of joins, dedup families (exact / MinHash / SimHash / n-gram),
merge/upsert, similarity search, text analysis, multimodal plumbing.
"""
