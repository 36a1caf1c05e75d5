"""Structured Streaming surface (SURVEY.md §2 B39-B43): events through
readStream with availableNow triggers; semantics checked against the
batch engine on the same data (the only sound oracle — see SURVEY §2
streaming scope note)."""

from __future__ import annotations
