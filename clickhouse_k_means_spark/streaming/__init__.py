"""Structured Streaming surface.

The reference is batch-iterative (SURVEY §2.9 — no streaming
operators); this package is the engine's idiomatic-Spark extension:
file-stream sources over the fixture layout, watermarked tumbling /
sliding window aggregation, and streaming nearest-centroid assignment
via ``foreachBatch`` (the shape SURVEY §2.9 names for streaming
k-means).
"""
