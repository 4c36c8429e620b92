"""Structured Streaming surface (incremental-batch semantics)."""
