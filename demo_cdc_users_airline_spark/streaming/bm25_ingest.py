"""Streaming document ingest against the PERSISTED BM25 inverted
index: each micro-batch is tokenized and APPENDED — postings into its
own (pfx, ingest_batch) partitions, collection statistics as a one-row
mergeable partial — so the index tracks the corpus at stream cadence
with no rebuild, and ``bm25_serve`` reflects every committed batch
immediately (per-term df comes from the pruned postings read, which
now includes the batch's rows; n_docs/avgdl from the bounded SUM over
the per-batch stats partials).

The third streaming maintainer beside ``streaming.lsh_ingest``
(MinHash-LSH dedup index) and ``streaming.ivf_ingest`` (IVF vector
index), with the same discipline: the sink is idempotent by batch id
(dynamic partition overwrite; tokenization is deterministic, so a
foreachBatch re-run touches exactly the same partitions and replaces
its own rows). Unlike the LSH pipeline there is no admission decision
— retrieval indexes ingest everything (dedup is the LSH index's job,
upstream).

At 100 TB: per batch, the work is tokenizing ONLY the new documents
(one batch-sized aggregate) and a one-row stats append; nothing
corpus-sized is read or shuffled. After K batches each queried pfx
slice holds up to K+1 file sets — run ``compact_bm25_index`` in a
maintenance window to fold them back into the base partition (serve
results are invariant: the posting row set is unchanged and the stats
SUM is associative).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.retrieval import append_to_bm25_index


@dataclass
class StreamingBm25Ingest:
    """documents stream (doc_id, text) → the persisted inverted index
    kept current batch-by-batch."""

    index_path: str

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = (batch_df.select("doc_id", "text")
                .localCheckpoint(eager=True))
        append_to_bm25_index(docs.sparkSession, self.index_path, docs,
                             batch_id=int(batch_id))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
