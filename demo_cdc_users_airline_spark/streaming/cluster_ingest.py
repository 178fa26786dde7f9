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

from ..operators.dedup import update_cluster_index


@dataclass
class StreamingClusterIngest:
    """documents stream (doc_id, text) → the persisted cluster-label
    artifact (build_cluster_index layout) kept current batch-by-batch."""

    index_path: str

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        if docs.isEmpty():
            return  # empty micro-batch: index, labels, overlay untouched
        update_cluster_index(spark, self.index_path, docs, int(batch_id))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
