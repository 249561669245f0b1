"""Structured Streaming wrappers (SURVEY.md §2.9)."""

from .ingest import stream_release_files, upsert_batch

__all__ = ["stream_release_files", "upsert_batch"]
