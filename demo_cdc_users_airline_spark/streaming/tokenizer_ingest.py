"""Streaming tokenizer drift monitor — a member of the
in-loop maintenance family (LSH, IVF, BM25, clusters, PQ, SQ8,
tokenizer), closing the last maintained-artifact family without an
in-loop quality hook (VERDICT r12 #6):

- every batch's text is censused under the LIVE persisted tokenizer
  (saved merges + saved alphabet bound as literals — one map-side-
  combinable pass over the micro-batch, the text_tokenizer_drift_report
  census) and appended to the maintainer's accumulated corpus table
  (ingest_batch partitions, purge-first idempotent);
- a drift REPORT row per batch persists the census next to the
  artifact — the operational twin of the gated report query;
- the RETRAIN gate compares the batch against the artifact's trained
  baseline (the ``bpe_stats`` table written at save time) with
  all-integer cross-multiplications: OOV characters past
  ``oov_tol_ppm``, or compression collapsing more than
  ``cpt_drop_tol_ppm`` below the training corpus's chars-per-token.
  On breach, ``retrain_tokenizer`` refits merges + pieces + alphabet +
  stats on the ACCUMULATED corpus (base + every ingested batch) and
  publishes a ``v<N>/`` generation with one atomic pointer replace —
  retraining IS this artifact's rebuild.

Retry semantics: the corpus append and the report row are idempotent
by batch partition. A retry that crosses a completed retrain censuses
the batch against the NEW artifact — the breach no longer fires (the
retrained ranges cover the batch by construction), the report row
records that state, and the ARTIFACT content is unchanged: resolved
reads are identical across the retry (the same across-swap contract
every versioned-pointer maintainer here has; asserted in
tests/test_streaming_tokenizer.py).

Same single-writer maintenance contract as every versioned-pointer
artifact (kmeans_ivf.stale_generation_dirs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from ..sources.loader import local_frame
from pyspark.sql import functions as F

from ..operators.tokenizer import (
    load_alphabet,
    load_bpe_merges,
    load_tokenizer_stats,
    retrain_tokenizer,
    save_tokenizer,
    tokenizer_census,
)


@dataclass
class StreamingTokenizerIngest:
    """documents stream (doc_id, text) → the persisted tokenizer
    artifact monitored (and retrained) batch-by-batch.

    ``path`` owns three subtrees: ``tok/`` (the versioned tokenizer
    artifact), ``corpus/`` (the accumulated training text, the frame a
    retrain refits on), ``report/`` (one census row per batch)."""

    path: str
    oov_tol_ppm: int = 10_000        # retrain past 1% OOV characters
    cpt_drop_tol_ppm: int = 150_000  # retrain past a 15% compression drop
    retrain_check_every: int = 1     # 0 = monitor-only (no retrain hook)

    @property
    def tok_path(self) -> str:
        return self.path + "/tok"

    @property
    def corpus_path(self) -> str:
        return self.path + "/corpus"

    @property
    def report_path(self) -> str:
        return self.path + "/report"

    def __post_init__(self) -> None:
        self._batches_since_check = 0

    # -- lifecycle ----------------------------------------------------------

    def build(self, spark, base_docs: DataFrame) -> None:
        """Initial train: persist the base corpus (ingest_batch = -1)
        and the stats-bearing artifact trained on it."""
        (base_docs.select("doc_id", "text")
         .withColumn("ingest_batch", F.lit(-1))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "static")
         .partitionBy("ingest_batch").parquet(self.corpus_path))
        save_tokenizer(spark, "", path=self.tok_path,
                       docs=spark.read.parquet(self.corpus_path)
                       .select("doc_id", "text"),
                       with_stats=True)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = (batch_df.select(F.col("doc_id").cast("long")
                                .alias("doc_id"), "text")
                .localCheckpoint(eager=True))
        if docs.isEmpty():
            return
        # 1. accumulate the corpus — idempotent by batch: the partition
        #    key IS the batch id, so dynamic overwrite makes a
        #    foreachBatch retry replace exactly its own rows (no purge
        #    needed: unlike cell-keyed tables, the partition value can
        #    never change across a retry)
        (docs.withColumn("ingest_batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(self.corpus_path))
        # 2. census the batch under the LIVE artifact
        merges = load_bpe_merges(spark, self.tok_path)
        alph = load_alphabet(spark, self.tok_path)
        base = load_tokenizer_stats(spark, self.tok_path)
        c = tokenizer_census(docs, merges, alph)
        # 3. the all-integer drift gate (cross-multiplied — never a
        #    float fraction): OOV rate, or compression dropping more
        #    than tol below the TRAINED baseline
        oov_breach = (c["oov_chars"] * 1_000_000
                      > self.oov_tol_ppm * c["n_chars"])
        cpt_breach = (c["chars_per_token_micro"] * 1_000_000
                      < base["chars_per_token_micro"]
                      * (1_000_000 - self.cpt_drop_tol_ppm))
        fired = 0
        if self.retrain_check_every > 0 and c["n_chars"] > 0:
            self._batches_since_check += 1
            if self._batches_since_check >= self.retrain_check_every:
                # the family cadence contract (StreamingSq8Ingest /
                # StreamingPqIngest): the gate is EVALUATED every Nth
                # batch and the window resets whether or not it fires
                self._batches_since_check = 0
                if oov_breach or cpt_breach:
                    retrain_tokenizer(
                        spark, self.tok_path,
                        spark.read.parquet(self.corpus_path)
                        .select("doc_id", "text"))
                    fired = 1
        # 4. report row (same batch-keyed idempotence; observational —
        #    the across-swap retry legitimately records fired = 0)
        (local_frame(spark, 
            [(int(batch_id), c["n_docs"], c["n_words"], c["n_chars"],
              c["n_tokens"], c["chars_per_token_micro"], c["oov_chars"],
              c["oov_ppm"], base["chars_per_token_micro"], fired)],
            "ingest_batch long, n_docs long, n_words long, n_chars long,"
            " n_tokens long, chars_per_token_micro long, oov_chars long,"
            " oov_ppm long, baseline_cpt_micro long, retrain_fired long")
         .coalesce(1).write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("ingest_batch").parquet(self.report_path))

    def start(self, docs: DataFrame, checkpoint_dir: str,
              trigger_once: bool = False):
        writer = (docs.writeStream
                  .outputMode("append")
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir))
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
