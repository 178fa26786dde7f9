"""Streaming vector ingest against the PERSISTED IVF index: each
micro-batch is quantized, assigned cells by the SAVED base-trained
codebook (loaded once — never retrained at stream cadence), and
APPENDED to the cell-partitioned index — the vector twin of
``streaming.lsh_ingest.StreamingLshIngest``, completing the lifecycle
symmetry between the two persisted serving artifacts:

- ``operators.kmeans_ivf`` owns the ARTIFACT (build_ivf_index /
  append_to_ivf_index / similarity_ivf_serve_topk — codebook + inline
  vectors partitioned by (cell, ingest_batch));
- this module owns the STREAM discipline: both sinks — the index
  itself and the per-batch ingest report — are idempotent by batch id
  (dynamic partition overwrite), so a crash-and-rerun under
  foreachBatch's at-least-once retries replaces its own rows instead
  of duplicating them. Cell assignment is a deterministic function of
  the saved codebook, so a re-run touches exactly the same
  (cell, batch) partitions.

The report table is the ops telemetry half: per (batch, cell) arrival
counts and summed quantization error — the same drift signal
``similarity_incremental_ivf`` computes as a one-shot report, here
accumulated batch-by-batch so a monitor can watch q_err rise on new
data and trigger the rebuild ``similarity_index_staleness`` measures
from the recall side.

At 100 TB: per batch, the work is the zero-shuffle broadcast-codebook
assignment map over ONLY the new vectors plus one k-row aggregate; the
index grows by exactly the batch's rows; nothing corpus-sized is read,
shuffled, or retrained. After K batches each touched cell holds K file
sets — run ``compact_ivf_index`` in a maintenance window to fold them
back into the base partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.kmeans_ivf import (
    append_to_ivf_index,
    assign_cells,
    load_codebook,
    quantize,
)
from ..sources.tables import AppendTable


@dataclass
class StreamingIvfIngest:
    """embeddings stream (id, embedding: array<double>) → (a) the
    persisted IVF index kept current batch-by-batch, (b) an append-only
    per-(batch, cell) ingest report (n_added, sum/avg q_err)."""

    index_path: str
    report_table: AppendTable

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vecs = quantize(
            batch_df.select(F.col("id").cast("long").alias("id"),
                            F.col("embedding").cast("array<double>")
                            .alias("vec"))).localCheckpoint(eager=True)

        # the index append: idempotent by batch id (its own
        # ingest_batch partitions, dynamic overwrite)
        append_to_ivf_index(spark, self.index_path, vecs,
                            batch_id=int(batch_id))

        # the drift report: a k-row-bounded aggregate of the SAME
        # deterministic assignment the append used
        cb = load_codebook(spark, self.index_path + "/codebook")
        report = (assign_cells(vecs, cb)
                  .groupBy("cell")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_added"),
                       # DECIMAL(38,0): a very large batch concentrated
                       # in one cell would wrap an int64 q_err total
                       # silently (the ADVICE-r7 rule, as
                       # similarity_incremental_ivf applies it)
                       F.sum(F.col("q_err").cast("decimal(38,0)"))
                       .alias("sum_q_err"))
                  .withColumn("avg_q_err",
                              F.expr("CAST(sum_q_err DIV n_added"
                                     " AS BIGINT)"))
                  .withColumn("sum_q_err",
                              F.col("sum_q_err").cast("decimal(38,0)")))
        self.report_table.append_idempotent(report, batch_id)

    def start(self, vectors: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (vectors.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
