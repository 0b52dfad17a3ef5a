"""Serving-path optimizations (no reference counterpart — the reference
handles each query fully independently, reloading model+index per request,
SURVEY.md §3.3)."""

from .batcher import Microbatcher, SearchBatcher

__all__ = ["Microbatcher", "SearchBatcher"]
