"""Central query catalog: name → (spark builder, DuckDB oracle SQL).

Aggregates the operator-coverage entries from every module. Each
builder is ``fn(spark, sf_dir) -> DataFrame``; oracle SQL (where the
operator is SQL-expressible) uses identical column aliases.
"""

from __future__ import annotations

from .plans import analytics

QUERIES: dict = {}
ORACLE: dict = {}

QUERIES.update(analytics.QUERIES)
ORACLE.update(analytics.ORACLE)

try:  # LLM-data operators (dedup / similarity / text) register here too
    from .operators import catalog as _opcat

    QUERIES.update(_opcat.QUERIES)
    ORACLE.update(_opcat.ORACLE)
except ImportError:
    pass
