"""Utilities: profiling/tracing, logging."""
