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
    rebuild_pq_index,
)


@dataclass
class StreamingPqIngest:
    """embeddings stream (id, embedding: array<double>) → the persisted
    PQ index kept current batch-by-batch.

    ``compact_check_every=N`` > 0 runs the compaction census every Nth
    batch and folds merge-due batch partitions in the quiesced
    foreachBatch window — ALWAYS excluding the batch being committed
    (folding it would strand its rows if foreachBatch retries it; the
    compact_pq_index exclude_batch contract).

    ``rebuild_check_every=N`` > 0 adds the PQ-space drift gate (the
    signal similarity_pq_drift_report certifies): every Nth batch the
    batch's mean PQ reconstruction error — ``pq_err`` is INLINE in the
    code table, written by the same argmin that assigned the codes —
    is compared against the mean of everything else in the index, via
    an all-integer cross-multiplied ppm ratio; on breach,
    ``rebuild_pq_index(keep_provenance=True)`` fires in the quiesced
    foreachBatch window. The anchor is recomputed per check with the
    batch under test excluded (a filtered footer+one-column aggregate
    — the ADVICE-r10 never-let-the-anchor-age rule, satisfied here by
    construction instead of incremental bookkeeping: the signal lives
    in the artifact itself, not a side report table). Coarse-space
    drift and slow-trend detection stay with the IVF maintainer, which
    shares the coarse quantizer."""

    index_path: str
    compact_check_every: int = 0  # 0 = compaction hook disabled
    rebuild_check_every: int = 0  # 0 = drift hook disabled
    rebuild_pqerr_ratio_ppm: int = 2_000_000  # batch avg > 2× live avg

    def __post_init__(self) -> None:
        self._batches_since_compact = 0
        self._batches_since_check = 0

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vecs = quantize(
            batch_df.select(F.col("id").cast("long").alias("id"),
                            F.col("embedding").cast("array<double>")
                            .alias("vec"))).localCheckpoint(eager=True)
        append_to_pq_index(spark, self.index_path, vecs,
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
        """batch_avg(pq_err) > (ratio_ppm/1e6) × rest_avg(pq_err),
        cross-multiplied — exact integer arithmetic, no float fraction
        (the CLAUDE.md threshold rule). Both sides read ONLY the
        pq_err column + partition footers of the code table; the
        reference side excludes the batch under test so a large
        drifted batch can never dilute its own trigger."""
        stats = (spark.read.parquet(pq_codes_path(self.index_path))
                 .groupBy(F.col("ingest_batch") == int(batch_id))
                 .agg(F.sum(F.col("pq_err").cast("decimal(38,0)"))
                      .alias("s"), F.count(F.lit(1)).alias("n"))
                 .collect())
        by = {bool(r[0]): (int(r["s"] or 0), int(r["n"])) for r in stats}
        b_sum, b_n = by.get(True, (0, 0))
        r_sum, r_n = by.get(False, (0, 0))
        if b_n == 0 or r_n == 0:
            return False
        if (b_sum * r_n * 1_000_000
                <= self.rebuild_pqerr_ratio_ppm * r_sum * b_n):
            return False
        rebuild_pq_index(spark, self.index_path, keep_provenance=True)
        return True

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
