"""Structured Streaming surface: CDC pipeline, windowed aggregations."""
