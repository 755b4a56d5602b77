"""Scalar/aggregate function surface queries (SURVEY §2.8, §1.3) —
populated incrementally; includes the flagship `greatest` parity query."""

from __future__ import annotations
