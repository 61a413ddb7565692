"""Structured Streaming variants of the minute rollups (SURVEY.md §2.9)."""
