"""Aggregated query catalog for the LLM-data-pipeline operators."""

from __future__ import annotations

from . import dedup, multimodal, similarity, text

QUERIES: dict = {}
ORACLE: dict = {}

for mod in (text, dedup, similarity, multimodal):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
