"""Utilities: structured metrics/logging, timing fences."""
