"""Training-data pipeline queries (dedup / similarity / text analysis /
multimodal) over the documents + embeddings tables — populated
incrementally."""

from __future__ import annotations
