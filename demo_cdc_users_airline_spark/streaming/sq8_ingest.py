"""Streaming maintainer for the persisted IVF×SQ8 index — the SIXTH
member of the in-loop maintenance family (LSH, IVF, BM25, clusters,
PQ, SQ8):

- every batch appends under the SAVED coarse quantizer and ranges
  (out-of-range components clamp to the rails and count into the
  inline ``n_clip`` column), idempotent by batch id: a
  foreachBatch at-least-once retry replaces its own rows exactly —
  even across a rebuild's range swap (the purge-first contract);
- ``compact_check_every=N`` folds merge-due batch partitions in the
  quiesced foreachBatch window, always excluding the batch being
  committed (compact_sq8_index's exclude_batch retry contract);
- ``rebuild_check_every=N`` adds the CLIP drift gate (the signal
  similarity_sq8_clip_report certifies): every Nth batch the batch's
  clipped-component rate is compared against ``rebuild_clip_ppm`` via
  all-integer cross-multiplication (never a float fraction); on
  breach, ``rebuild_sq8_index(keep_provenance=True)`` fires — fresh
  ranges cover the drifted data, clip saturation returns to zero by
  construction. Both sides of the check read ONLY the n_clip column +
  partition footers of the code table.

Same single-writer maintenance contract as every versioned-pointer
artifact (see kmeans_ivf.stale_generation_dirs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kmeans_ivf import quantize
from ..operators.sq8 import (
    append_to_sq8_index,
    compact_sq8_index,
    rebuild_sq8_index,
    sq8_codes_path,
    sq8_ranges_path,
)


@dataclass
class StreamingSq8Ingest:
    """embeddings stream (id, embedding: array<double>) → the persisted
    IVF×SQ8 index kept current batch-by-batch."""

    index_path: str
    compact_check_every: int = 0   # 0 = compaction hook disabled
    rebuild_check_every: int = 0   # 0 = clip hook disabled
    rebuild_clip_ppm: int = 50_000  # rebuild past 5% clipped components

    def __post_init__(self) -> None:
        self._batches_since_compact = 0
        self._batches_since_check = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vecs = quantize(
            batch_df.select(F.col("id").cast("long").alias("id"),
                            F.col("embedding").cast("array<double>")
                            .alias("vec"))).localCheckpoint(eager=True)
        append_to_sq8_index(spark, self.index_path, vecs,
                            batch_id=int(batch_id))
        if self.rebuild_check_every > 0:
            self._batches_since_check += 1
            if self._batches_since_check >= self.rebuild_check_every:
                self._batches_since_check = 0
                self._maybe_rebuild(spark, int(batch_id))
        if self.compact_check_every > 0:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_check_every:
                self._batches_since_compact = 0
                self._maybe_compact(spark, int(batch_id))

    def _maybe_rebuild(self, spark, batch_id: int) -> bool:
        """batch clipped-components > (ppm/1e6) × batch components,
        cross-multiplied in exact Python ints (the CLAUDE.md threshold
        rule). The rate is ABSOLUTE, not relative to the rest of the
        index: the base clips zero by construction (ranges were fit on
        it), so any material clip rate is new data escaping the saved
        ranges — the one failure mode an SQ index has. Reads ONLY the
        n_clip column + footers of the batch's own partitions."""
        dim = len(spark.read.parquet(
            sq8_ranges_path(self.index_path)).collect())
        row = (spark.read.parquet(sq8_codes_path(self.index_path))
               .filter(F.col("ingest_batch") == int(batch_id))
               .agg(F.sum(F.col("n_clip").cast("decimal(38,0)"))
                    .alias("s"), F.count(F.lit(1)).alias("n"))
               .collect()[0])
        s_clip, n_vecs = int(row["s"] or 0), int(row["n"])
        if n_vecs == 0:
            return False
        if s_clip * 1_000_000 <= self.rebuild_clip_ppm * n_vecs * dim:
            return False
        rebuild_sq8_index(spark, self.index_path, keep_provenance=True)
        return True

    def _maybe_compact(self, spark, batch_id: int) -> bool:
        """Fold only when a FOLDABLE batch exists — neither the base
        (-1) nor the in-flight batch (kept replaceable for retries).
        Partition-column-only census: footer/listing IO."""
        foldable = (spark.read.parquet(sq8_codes_path(self.index_path))
                    .select("ingest_batch").distinct()
                    .filter(~F.col("ingest_batch").isin(
                        -1, int(batch_id))).limit(1).count())
        if not foldable:
            return False
        compact_sq8_index(spark, self.index_path,
                          exclude_batch=int(batch_id))
        return True

    def start(self, vectors: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (vectors.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
