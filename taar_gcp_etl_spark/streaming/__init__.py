"""Structured Streaming variants of the event-time operators (SURVEY.md
§2.11 streaming). Batch semantics first — every operator here reuses the
same groupBy(window/session_window) shape as operators/windows.py, adding
watermarks for state eviction. jobs.py holds the runnable pipelines.
"""
