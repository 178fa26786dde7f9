"""Streaming training-manifest maintainer — a member of the
in-loop maintenance family (VERDICT r13 #2): each arriving
(doc_id, text[, source]) batch is re-curated against the artifact's
FROZEN base state (quality in-row, exact-dedup vs frozen fingerprints,
near-dup admission via the frozen LSH probe, decontamination vs the
frozen bench set, token budgets under the frozen merges, copies under
the frozen rf) and appended as the tail packs of exactly the
(split, shard) streams it touches — O(batch) per batch, never a
corpus re-pack (operators/manifest.py holds the semantics and the
oracle-gated math; this class is the foreachBatch wiring).

Retry semantics: update_manifest_index is purge-first + dynamic by the
batch's own (split=*, shard=*, ingest_batch=batch_id) partitions, and
batch curation is a pure function of (batch content, frozen base
state) — a foreachBatch retry replaces exactly its own rows and can
never be shadowed by its failed attempt.

Reference parity: the per-block incremental fold of a stream into a
queryable destination (users_mv.pipe:19-20), applied to the
training-dataset manifest as the destination.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.manifest import update_manifest_index


@dataclass
class StreamingManifestIngest:
    """documents stream (doc_id, text[, source]) → the maintained
    manifest artifact at ``index_path`` (build_manifest_index layout;
    rows without a source column append under source = 'stream', an
    rf_ppm = 1000000 fallback source unless the frozen rf knows it)."""

    index_path: str

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.localCheckpoint(eager=True)
        if docs.isEmpty():
            return
        update_manifest_index(docs.sparkSession, self.index_path,
                              docs, int(batch_id))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
