"""Relational operator inventory queries (SURVEY §2.2-§2.7) — populated
incrementally; each registered query proves one operator row against the
DuckDB oracle."""

from __future__ import annotations
