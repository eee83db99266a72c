"""Structured Streaming extension (driver north star; the reference is
batch-only — SURVEY.md §1.1)."""
