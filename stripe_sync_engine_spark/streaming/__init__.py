"""Structured Streaming ingestion: webhook event stream → foreachBatch →
timestamp-protected merges (SURVEY.md §2.9, §3.1 Spark shape)."""
