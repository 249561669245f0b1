"""Structured Streaming wrappers (SURVEY.md §2.9)."""

from .ingest import stream_release_files, upsert_batch
from .windows import dedup_stream, windowed_event_counts

__all__ = ["dedup_stream", "stream_release_files", "upsert_batch", "windowed_event_counts"]
