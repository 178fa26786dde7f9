"""Aggregated query catalog for the LLM-data-pipeline operators."""

from __future__ import annotations

from . import (classifier, curation, dedup, graph, importance, kmeans_ivf,
               manifest, multimodal, pq, profiling, retrieval, sampling,
               similarity, sketches, sq8, temporal, text, tokenizer,
               training_dataset)

QUERIES: dict = {}
ORACLE: dict = {}

for mod in (text, dedup, similarity, kmeans_ivf, multimodal, sampling, temporal,
            curation, pq, sq8, retrieval, importance, tokenizer, sketches,
            classifier, graph, profiling, training_dataset, manifest):
    QUERIES.update(mod.QUERIES)
    ORACLE.update(mod.ORACLE)
