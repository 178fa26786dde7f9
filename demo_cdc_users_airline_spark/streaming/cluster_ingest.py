"""Streaming near-dup CLUSTER maintenance against the persisted
cluster index: each micro-batch extends the saved labels through
``update_cluster_index`` — probe the artifact's LSH index for the
batch's verified edges (partition-pruned, text-free on the corpus
side), contract touched components to their resolved labels, a
batch-bounded union-find, relabels into the pointer-jumped merges
overlay — the fourth streaming index maintainer, completing the
family: LSH (lsh_ingest), IVF (ivf_ingest), BM25 (bm25_ingest),
CLUSTERS (this module).

Stream discipline:
- the batch's edge/label rows land in their own ``ingest_batch``
  partitions (dynamic overwrite) and the probe self-excludes the
  batch's own LSH partition, so a foreachBatch retry replaces its
  rows instead of duplicating;
- the merges overlay is a deterministic function of (pre-batch state,
  batch), and replay converges: a retry recomputes the same final
  labels whether or not the first attempt got as far as the overlay
  write (asserted for the post-everything retry in
  tests/test_cluster_index.py and the mid-stream retry in
  tests/test_streaming_cluster_ingest.py);
- an empty micro-batch is a structural no-op (the r9 empty-batch
  safety rule for every maintainer).

At 100 TB: per batch the work is the increment's shingling, the
pruned index-slice probe, a union-find over the BATCH's edges, and a
k-row overlay rewrite — O(increment); the global CC fixpoint never
re-runs (components only grow; merges are label-contracted).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import compact_cluster_index, update_cluster_index


@dataclass
class StreamingClusterIngest:
    """documents stream (doc_id, text) → the persisted cluster-label
    artifact (build_cluster_index layout) kept current batch-by-batch.

    Auto-compaction (the fourth member of the in-loop hook family):
    with ``compact_check_every=N`` > 0, every Nth batch the maintainer
    folds when the dedup_cluster_compaction_policy census says so — an
    accumulated merges overlay (every entry is a broadcast-join-side
    row each resolved read pays) or a foldable edge/label batch
    (neither base nor the batch being committed) — via
    ``compact_cluster_index(exclude_batch=…)``, so the in-flight
    batch's partitions stay replaceable for foreachBatch retries.

    The overlay-driven fold is gated on ``overlay_fold_min`` entries
    (ADVICE r10): the fold rewrites the FULL labels/edges tables, so
    firing it on ANY non-empty overlay would make every
    merge-producing batch pay an O(corpus) rewrite — resolved reads
    are one broadcast join regardless of overlay size, so a small
    overlay costs effectively nothing until it accumulates. A foldable
    BATCH still triggers as before (that is the file-set growth the
    fold exists to bound, amortized by the check cadence)."""

    index_path: str
    compact_check_every: int = 0  # 0 = compaction hook disabled
    overlay_fold_min: int = 4     # fold on overlay size >= this

    def __post_init__(self) -> None:
        self._batches_since_compact = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        if docs.isEmpty():
            return  # empty micro-batch: index, labels, overlay untouched
        update_cluster_index(spark, self.index_path, docs, int(batch_id))
        if self.compact_check_every > 0:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_check_every:
                self._batches_since_compact = 0
                self._maybe_compact(spark, int(batch_id))

    def _maybe_compact(self, spark, batch_id: int) -> bool:
        overlay = (spark.read.parquet(self.index_path + "/merges")
                   .limit(self.overlay_fold_min).count())
        foldable = (spark.read.parquet(self.index_path + "/labels")
                    .select("ingest_batch").distinct()
                    .filter(~F.col("ingest_batch").isin(
                        -1, int(batch_id))).limit(1).count())
        if overlay < self.overlay_fold_min and not foldable:
            return False
        compact_cluster_index(spark, self.index_path,
                              exclude_batch=int(batch_id))
        return True

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
