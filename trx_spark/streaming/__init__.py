"""Structured Streaming: the online/incremental mode (SURVEY §2.9)."""
