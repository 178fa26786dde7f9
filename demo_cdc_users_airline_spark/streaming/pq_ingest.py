"""Streaming vector ingest against the PERSISTED PQ index: each
micro-batch is quantized, coarse-assigned and PQ-encoded under the
SAVED codebooks (loaded from the artifact — never retrained at stream
cadence), and appended to the (cell, ingest_batch)-partitioned code
table — the compression tier's maintainer, completing the
self-maintaining symmetry across all five persisted artifact families
(LSH / IVF / BM25 / clusters / PQ).

Split of responsibilities, mirroring streaming.ivf_ingest:
- ``operators.pq`` owns the ARTIFACT (build_pq_index /
  append_to_pq_index / pq_serve — coarse + sub-codebooks + code table);
- this module owns the STREAM discipline: the append is idempotent by
  batch id (purge-first + dynamic partition overwrite), so a
  foreachBatch at-least-once retry replaces its own rows exactly —
  even across a rebuild's codebook swap (the purge handles the
  different cell assignment);
- DRIFT monitoring is deliberately NOT duplicated here: the PQ index
  shares its coarse quantizer with the IVF family, whose maintainer
  (StreamingIvfIngest) already watches q_err per batch and trend and
  fires the rebuild. A deployment runs both maintainers off the same
  stream; a PQ rebuild (rebuild_pq_index) belongs in the same
  maintenance window.

At 100 TB: per batch, the work is two broadcast-codebook map passes
(coarse assign + packed encode) over ONLY the new vectors — zero
shuffles beyond the writer's repartition("cell"); nothing corpus-sized
is read or retrained. After K batches each touched cell holds K file
sets — the in-loop compaction hook folds them (always excluding the
in-flight batch, the retry contract).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kmeans_ivf import quantize
from ..operators.pq import (
    append_to_pq_index,
    compact_pq_index,
    pq_codes_path,
)


@dataclass
class StreamingPqIngest:
    """embeddings stream (id, embedding: array<double>) → the persisted
    PQ index kept current batch-by-batch.

    ``compact_check_every=N`` > 0 runs the compaction census every Nth
    batch and folds merge-due batch partitions in the quiesced
    foreachBatch window — ALWAYS excluding the batch being committed
    (folding it would strand its rows if foreachBatch retries it; the
    compact_pq_index exclude_batch contract)."""

    index_path: str
    compact_check_every: int = 0  # 0 = compaction hook disabled

    def __post_init__(self) -> None:
        self._batches_since_compact = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vecs = quantize(
            batch_df.select(F.col("id").cast("long").alias("id"),
                            F.col("embedding").cast("array<double>")
                            .alias("vec"))).localCheckpoint(eager=True)
        append_to_pq_index(spark, self.index_path, vecs,
                           batch_id=int(batch_id))
        if self.compact_check_every > 0:
            self._batches_since_compact += 1
            if self._batches_since_compact >= self.compact_check_every:
                self._batches_since_compact = 0
                self._maybe_compact(spark, int(batch_id))

    def _maybe_compact(self, spark, batch_id: int) -> bool:
        """Fold only when a FOLDABLE batch exists — neither the base
        (-1) nor the in-flight batch (kept replaceable for retries).
        Partition-column-only census: footer/listing IO (the
        StreamingIvfIngest._maybe_compact residue rule)."""
        foldable = (spark.read.parquet(pq_codes_path(self.index_path))
                    .select("ingest_batch").distinct()
                    .filter(~F.col("ingest_batch").isin(
                        -1, int(batch_id))).limit(1).count())
        if not foldable:
            return False
        compact_pq_index(spark, self.index_path,
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
