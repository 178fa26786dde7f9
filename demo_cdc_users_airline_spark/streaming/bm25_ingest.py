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
from pyspark.sql import functions as F

from ..operators.retrieval import (
    append_to_bm25_index,
    compact_bm25_index,
)


@dataclass
class StreamingBm25Ingest:
    """documents stream (doc_id, text) → the persisted inverted index
    kept current batch-by-batch.

    Auto-compaction: with ``compact_check_every=N`` > 0, every Nth
    batch the maintainer runs the retrieval_bm25_compaction_policy
    census (partition columns only — footer/listing IO) and folds the
    accumulated batch partitions when any pfx slice is merge-due,
    EXCLUDING the batch being committed (compact_bm25_index's
    exclude_batch retry contract)."""

    index_path: str
    compact_check_every: int = 0  # 0 = compaction hook disabled

    def __post_init__(self) -> None:
        self._batches_since_compact = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = (batch_df.select("doc_id", "text")
                .localCheckpoint(eager=True))
        spark = docs.sparkSession
        append_to_bm25_index(spark, self.index_path, docs,
                             batch_id=int(batch_id))
        if self.compact_check_every > 0:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_check_every:
                self._batches_since_compact = 0
                self._maybe_compact(spark, int(batch_id))

    def _maybe_compact(self, spark, batch_id: int) -> bool:
        # fold only when a FOLDABLE batch exists (neither base -1 nor
        # the in-flight batch) — the {-1, in-flight} census is the
        # steady state and folding it is a zero-benefit full rewrite
        foldable = (spark.read.parquet(self.index_path + "/postings")
                    .select("ingest_batch").distinct()
                    .filter(~F.col("ingest_batch").isin(
                        -1, int(batch_id))).limit(1).count())
        if not foldable:
            return False
        compact_bm25_index(spark, self.index_path,
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
