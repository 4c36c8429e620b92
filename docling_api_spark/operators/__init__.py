"""Spark-side operators: extraction pipeline, renders, chunking,
embedding, retrieval, dedup, text stats, similarity search."""
