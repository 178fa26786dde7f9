"""Aggregated query catalog for the LLM-data-pipeline operators."""

from __future__ import annotations

from . import (classifier, curation, dedup, importance, kmeans_ivf,
               multimodal, pq, retrieval, sampling, similarity, sketches,
               temporal, text, tokenizer)

QUERIES: dict = {}
ORACLE: dict = {}

for mod in (text, dedup, similarity, kmeans_ivf, multimodal, sampling, temporal,
            curation, pq, retrieval, importance, tokenizer, sketches,
            classifier):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
