"""demo_cdc_users_airline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference CDC analytics application
(tinybirdco/demo-cdc-users-airline): append-only CDC event logs,
last-writer-wins versioned tables (ReplacingMergeTree semantics),
a pipe/node query framework with parameterized endpoints, scheduled
incremental snapshots, and streaming upsert — plus large-scale
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Everything is built on the public PySpark DataFrame / SQL / Structured
Streaming API and designed for a multi-executor cluster at 100 TB scale,
while remaining testable on local[N].
"""

__version__ = "0.1.0"
