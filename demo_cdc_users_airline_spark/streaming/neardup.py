"""Streaming NEAR-dup dedup: first-writer-wins per simhash band bucket,
with exact Hamming verification — the streaming twin of
``dedup_simhash_pairs``, completing the batch/streaming symmetry the CDC
core already has (every batch dedup family member whose state is a
per-key identity set gets a streaming form).

Semantics: an arriving document is REJECTED iff its 60-bit simhash is
within Hamming ≤ 3 of (a) any previously ADMITTED document, or (b) any
lower-doc_id document in the same micro-batch. (b) is deliberately
greedy: a within-batch rejected doc can still shadow a later doc of the
same batch — a conservative, order-free policy that keeps the batch
computation one joins-pass instead of a sequential scan; across batches
the guarantee is exact first-writer-wins, because only admitted docs
enter the state. Rejected docs never shadow future batches.

State = the admitted table ITSELF: each batch probes the admitted docs'
band index (4×15-bit bands — pigeonhole-complete for Hamming ≤ 3, the
same banding as the batch operator), verifies band collisions with an
exact int64 Hamming check, and appends survivors via the idempotent
batch-id sink. That makes restart safety structural: the checkpoint
owns source offsets, the parquet table owns the state, and a batch
re-run replaces its own partition (its earlier attempt is excluded from
the probe by batch id, so it never shadows itself).

At 100 TB: the probe is a join of the batch's 4·|batch| band rows
against the admitted band index on (band, band_key) — at scale keep
the admitted index as a compacted (band, band_key, simhash, doc_id)
table partitioned by band_key range so the probe prunes; signatures are
int64s end-to-end, text never joins. (An
``applyInPandasWithState``/RocksDB formulation would co-locate state
with the stream; the table-as-state form is preferred here because the
admitted set must be queryable as a corpus anyway.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _SH_MAX_HAMMING, band_key_structs, simhash_expr
from ..sources.tables import AppendTable


@dataclass
class StreamingNearDupDedup:
    """documents stream → append-only table of admitted (non-near-dup)
    documents with their simhash signatures."""

    out_table: AppendTable
    max_hamming: int = _SH_MAX_HAMMING

    def _with_sig(self, docs: DataFrame) -> DataFrame:
        # bind toks in a prior projection (see simhash_expr)
        return (docs
                .withColumn("toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
                .withColumn("simhash", F.expr(simhash_expr("toks")))
                .drop("toks"))

    def _bands(self, sig: DataFrame, id_col: str) -> DataFrame:
        return (sig.select(F.col("doc_id").alias(id_col), "simhash",
                           F.explode(band_key_structs()).alias("bd"))
                .select(id_col, F.col("simhash").alias(f"{id_col}_sh"),
                        "bd.band", "bd.band_key"))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        sig = self._with_sig(batch_df).localCheckpoint(eager=True)
        new_bands = self._bands(sig, "new_id")
        ham = F.bit_count(F.expr("new_id_sh ^ old_sh"))

        rejected = None
        spark = batch_df.sparkSession
        if self.out_table.exists():
            # admitted state, EXCLUDING this batch's own partition (a
            # re-run after a crash-before-checkpoint-commit must not be
            # shadowed by its failed attempt's rows)
            prior = (spark.read.parquet(self.out_table.path)
                     .filter(F.col("ingest_batch_id") < F.lit(int(batch_id)))
                     .select("doc_id", "simhash"))
            prior_bands = (self._bands(prior, "old_id")
                           .withColumnRenamed("old_id_sh", "old_sh"))
            rejected = (new_bands.join(prior_bands, ["band", "band_key"])
                        .filter(ham <= self.max_hamming)
                        .select(F.col("new_id").alias("doc_id")))
        # within-batch greedy: a doc is shadowed by any LOWER-id batch doc
        # within the Hamming radius (see module docstring for the policy)
        lower = (new_bands.select(F.col("new_id").alias("old_id"),
                                  F.col("new_id_sh").alias("old_sh"),
                                  "band", "band_key"))
        in_batch = (new_bands.join(lower, ["band", "band_key"])
                    .filter((F.col("old_id") < F.col("new_id"))
                            & (ham <= self.max_hamming))
                    .select(F.col("new_id").alias("doc_id")))
        rejected = in_batch if rejected is None else rejected.unionByName(in_batch)
        admitted = sig.join(rejected.distinct(), "doc_id", "left_anti")
        self.out_table.append_idempotent(admitted, batch_id)

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
