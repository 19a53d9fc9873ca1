"""Structured Streaming integration: topic readStream/writeStream."""
