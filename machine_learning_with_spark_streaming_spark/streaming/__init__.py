"""Structured Streaming ingest + event-time semantics (SURVEY.md §2.10)."""
