"""Streaming exact dedup: first-writer-wins on a content fingerprint,
continuously.

The batch dedup family (operators/dedup.py) answers "which documents
in this corpus are duplicates"; a training-data INGEST pipeline needs
the streaming form — as documents arrive, keep the first occurrence of
each content fingerprint and drop every later one, across micro-batch
boundaries and restarts.

Spark-first: the fingerprint is a map-side md5 (identical to
dedup_exact's), and the cross-batch memory is Structured Streaming's
own ``dropDuplicates`` state store — no hand-rolled state table. Per
micro-batch this is one shuffle on the 16-byte fingerprint; the state
store holds one entry per DISTINCT fingerprint ever seen (unbounded by
design, like the CDC entity state — a corpus's identity set IS its
state; use ``dropDuplicatesWithinWatermark`` instead when ingest-time
re-sends are the only duplicate source and state must stay bounded).

At 100 TB: state is hash-partitioned across executors with the same
fingerprint shuffle the batch operator uses; the RocksDB state backend
keeps it off-heap (exercised for real — semantics + restart parity on
``RocksDBStateStoreProvider`` in tests/test_streaming_dedup.py);
nothing ever shuffles document text — the fingerprint travels, the
payload rides along only for kept rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import AppendTable


@dataclass
class StreamingExactDedup:
    """documents stream → append-only table of first-seen documents.

    Restart-safe: the checkpoint persists both source offsets and the
    fingerprint state store, so a restarted query never re-ADMITS a
    previously committed fingerprint; and because the sink writes each
    micro-batch to its own batch-id partition with dynamic overwrite
    (``append_idempotent``), a batch re-run after a crash between the
    sink write and the checkpoint commit replaces its own rows rather
    than re-emitting duplicates (graceful stop/restart verified in
    tests/test_streaming_dedup.py; the mid-commit case is covered by the
    sink's partition-overwrite idempotence)."""

    out_table: AppendTable

    @staticmethod
    def plan(docs: DataFrame) -> DataFrame:
        """fingerprint + built-in stateful dedup (dedup_exact's map-side
        hash; dropDuplicates supplies the cross-batch seen-set)."""
        return (docs.withColumn(
                    "fingerprint", F.md5(F.lower(F.trim(F.col("text")))))
                .dropDuplicates(["fingerprint"]))

    @staticmethod
    def plan_with_ttl(docs: DataFrame, ts_col: str,
                      ttl_delay: str) -> DataFrame:
        """Bounded-state variant: ``dropDuplicatesWithinWatermark`` —
        the identity set forgets a fingerprint once the event-time
        watermark moves ``ttl_delay`` past its last sighting, so state
        is O(traffic within the TTL), not O(all fingerprints ever).

        This is the right mode when ingest-time RE-SENDS are the only
        duplicate source (at-least-once upstream delivery): a re-send
        arrives within seconds-to-minutes of the original, so a short
        TTL absorbs it, while a legitimately re-published document far
        later is admitted AGAIN (by design — it is new content to a
        bounded-memory pipeline). The unbounded ``plan`` remains the
        corpus-identity mode."""
        return (docs.withColumn(
                    "fingerprint", F.md5(F.lower(F.trim(F.col("text")))))
                .withWatermark(ts_col, ttl_delay)
                .dropDuplicatesWithinWatermark(["fingerprint"]))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (self.plan(docs).writeStream
                  .outputMode("append")
                  # idempotent by batchId (see class docstring)
                  .foreachBatch(lambda df, bid:
                                self.out_table.append_idempotent(df, bid))
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
