"""Structured Streaming variants of the wave pipeline."""
